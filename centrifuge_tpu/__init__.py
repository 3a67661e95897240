"""centrifuge_tpu: a TPU-native metagenomic sequence classification engine.

A from-scratch reimplementation of the capabilities of Centrifuge
(Kim et al., Genome Research 2016; reference C++ code mounted read-only at
/root/reference) designed for JAX/XLA on TPU:

- FM-index (BWT) backward search expressed as a batched, jittable integer
  state machine over thousands of reads in lockstep.
- Rank/LF queries as vectorized gathers + 2-bit popcount tricks into a
  checkpointed, repacked BWT that lives in HBM.
- Host-side (numpy) taxonomy assignment, abundance EM, and report writers
  that are byte-compatible with the reference's TSV / report / kreport
  outputs.

Package layout:
  index/     .cf index reading + TPU repacking + taxonomy model
  ops/       FM-index primitives (numpy oracle + JAX/Pallas kernels)
  classify/  the classification pipeline (search, resolve, assign)
  io/        FASTA/FASTQ input, TSV output
  report/    abundance EM, report file, kreport
  parallel/  device mesh sharding helpers
  build/     index construction (suffix array -> .cf)
"""

__version__ = "0.1.0"
