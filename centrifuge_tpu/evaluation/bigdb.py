"""Deterministic production-regime benchmark database.

256 Mbp across 64 synthetic genomes (64 species, 16 genera, 4 domains):
large enough that the FM index (~90 MB of BWT sides + SA sample) falls
out of CPU caches, putting the reference C++ engine in its production
DRAM-latency regime; small enough to build in minutes with SA-IS and fit
comfortably in one TPU's HBM on the narrow (int32) path.
"""

from __future__ import annotations

import os

import numpy as np

N_GENOMES = 64
GENOME_LEN = 4_000_000
SEED = 20260817


def ensure_bigdb(workdir: str, verbose: bool = False) -> str:
    """Create (or reuse) the benchmark DB + index under workdir.

    Returns the index basename. Files: bigdb.fa, conv.dmp, nodes.dmp,
    names.dmp, bigdb.{1,2,3,4}.cf, reads_100k.fq.
    """
    os.makedirs(workdir, exist_ok=True)
    base = os.path.join(workdir, "bigdb")
    if os.path.exists(base + ".1.cf") and os.path.exists(
            os.path.join(workdir, "reads_100k.fq")):
        return base

    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", np.uint8)

    fa = os.path.join(workdir, "bigdb.fa")
    conv = os.path.join(workdir, "conv.dmp")
    nodes = os.path.join(workdir, "nodes.dmp")
    names = os.path.join(workdir, "names.dmp")

    if not os.path.exists(fa):
        if verbose:
            print("generating 256 Mbp database ...", flush=True)
        with open(fa, "wb") as f, open(conv, "w") as cf:
            for g in range(N_GENOMES):
                tid = 1000 + g
                seq = bases[rng.integers(0, 4, GENOME_LEN)]
                f.write(b">bseq%d benchmark genome\n" % g)
                for i in range(0, GENOME_LEN, 80):
                    f.write(seq[i: i + 80].tobytes() + b"\n")
                cf.write(f"bseq{g}\t{tid}\n")
        with open(nodes, "w") as f:
            f.write("1\t|\t1\t|\tno rank\t|\n")
            for d in range(4):
                f.write(f"{10+d}\t|\t1\t|\tsuperkingdom\t|\n")
            for ge in range(16):
                f.write(f"{100+ge}\t|\t{10 + ge % 4}\t|\tgenus\t|\n")
            for s in range(N_GENOMES):
                f.write(f"{1000+s}\t|\t{100 + s % 16}\t|\tspecies\t|\n")
        with open(names, "w") as f:
            f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
            for d in range(4):
                f.write(f"{10+d}\t|\tBigDomain{d}\t|\t\t|\tscientific name\t|\n")
            for ge in range(16):
                f.write(f"{100+ge}\t|\tBigGenus{ge}\t|\t\t|\tscientific name\t|\n")
            for s in range(N_GENOMES):
                f.write(f"{1000+s}\t|\tBigSpecies{s}\t|\t\t|\tscientific name\t|\n")

    if not os.path.exists(base + ".1.cf"):
        if verbose:
            print("building 256 Mbp index (SA-IS) ...", flush=True)
        from ..build.builder import build_index
        build_index([fa], base, conv, nodes, names, verbose=verbose)

    reads = os.path.join(workdir, "reads_100k.fq")
    if not os.path.exists(reads):
        if verbose:
            print("simulating 100k reads ...", flush=True)
        from .simulate import SimConfig, simulate
        simulate(fa, conv, os.path.join(workdir, "reads_100k"),
                 SimConfig(num_fragments=100_000, read_length=100,
                           error_rate=0.002, seed=7))
        os.replace(os.path.join(workdir, "reads_100k.fq"), reads) \
            if os.path.exists(os.path.join(workdir, "reads_100k.fq")) else None
    return base


PC_N_GENOMES = 3000    # 3000 x 4 Mbp = 12 Gbp: the p_compressed class
                       # (reference README.md:41-43 -- 4.2-12 GB indexes;
                       # ours: ~3.4 GB .1.cf + ~1.5 GB .2.cf)


def ensure_pcdb(workdir: str, verbose: bool = False,
                n_genomes: int = PC_N_GENOMES,
                n_reads: int = 131072) -> str:
    """Create (or reuse) the production-scale DB + index under workdir.

    12 Gbp across 3000 synthetic genomes, built with the bounded-memory
    blockwise path (the in-memory SA-IS would need ~280 GB here). This
    is the scale where the reference CPU engine leaves its caches for
    good (BASELINE.md:53-60) and the BASELINE >=10x/host target is
    defined. Returns the index basename; also simulates `n_reads`
    100 bp reads (pc_reads.fq).
    """
    import resource
    import time as _t
    os.makedirs(workdir, exist_ok=True)
    base = os.path.join(workdir, "pcdb")
    reads = os.path.join(workdir, "pc_reads.fq")
    if (os.path.exists(base + ".1.cf") and os.path.exists(reads)
            and os.path.exists(os.path.join(workdir, "pc_pairs_1.fq"))):
        return base

    rng = np.random.default_rng(SEED + 2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fa = os.path.join(workdir, "pcdb.fa")
    conv = os.path.join(workdir, "pconv.dmp")
    nodes = os.path.join(workdir, "pnodes.dmp")
    names = os.path.join(workdir, "pnames.dmp")

    if not os.path.exists(fa):
        if verbose:
            print(f"generating {n_genomes * GENOME_LEN / 1e9:.1f} Gbp "
                  "database ...", flush=True)
        with open(fa, "wb") as f, open(conv, "w") as cf:
            for g in range(n_genomes):
                tid = 1000 + g
                seq = bases[rng.integers(0, 4, GENOME_LEN)]
                f.write(b">pseq%d pc benchmark genome\n" % g)
                f.write(b"\n".join(
                    seq[i: i + 80].tobytes()
                    for i in range(0, GENOME_LEN, 80)) + b"\n")
                cf.write(f"pseq{g}\t{tid}\n")
        with open(nodes, "w") as f:
            f.write("1\t|\t1\t|\tno rank\t|\n")
            for ge in range(64):
                f.write(f"{100+ge}\t|\t1\t|\tgenus\t|\n")
            for s in range(n_genomes):
                f.write(f"{1000+s}\t|\t{100 + s % 64}\t|\tspecies\t|\n")
        with open(names, "w") as f:
            f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
            for s in range(n_genomes):
                f.write(f"{1000+s}\t|\tPcSpecies{s}\t|\t\t|\t"
                        "scientific name\t|\n")

    if not os.path.exists(base + ".1.cf"):
        if verbose:
            print("building 12 Gbp index (bounded blockwise) ...",
                  flush=True)
        t0 = _t.time()
        from ..build.builder import build_index
        n_total = n_genomes * GENOME_LEN
        # bmaxdivn 16: the block buffer + its sort transients scale with
        # bmax, and n/16 keeps the whole sort+emit phase under the
        # ~2.6 B/base budget (blocksa.cpp header); n/8 measured
        # 4.66 B/base at 12 Gbp before the round-4 gather/copy fixes
        build_index([fa], base, conv, nodes, names, verbose=verbose,
                    blockwise=True, bmax=n_total // 16)
        # NOTE: the blockwise builder resets the kernel RSS watermark per
        # phase (blockwise._reset_rss_hwm also clears what ru_maxrss
        # reads), so a watermark read here reflects only the tail of the
        # build, NOT its peak. The authoritative per-phase peaks are the
        # [build-rss] lines the builder prints; the build peak is their
        # max (measured 2.97 B/base in the sort+emit phase at 12 Gbp).
        if verbose:
            print(f"built in {_t.time()-t0:.0f}s (peak RSS: see the "
                  f"per-phase [build-rss] lines above)", flush=True)

    if not os.path.exists(reads):
        if verbose:
            print(f"simulating {n_reads} reads ...", flush=True)
        from .simulate import SimConfig, simulate
        simulate(fa, conv, os.path.join(workdir, "pc_reads"),
                 SimConfig(num_fragments=n_reads, read_length=100,
                           error_rate=0.002, seed=13))
    if not os.path.exists(os.path.join(workdir, "pc_pairs_1.fq")):
        if verbose:
            print(f"simulating {n_reads // 2} read pairs ...", flush=True)
        from .simulate import SimConfig, simulate
        simulate(fa, conv, os.path.join(workdir, "pc_pairs"),
                 SimConfig(num_fragments=n_reads // 2, read_length=100,
                           error_rate=0.002, seed=17, paired=True))
    return base


WIDE_N_GENOMES = 550   # 550 x 4 Mbp = 2.2 Gbp > 2^31: the 64-bit regime


def ensure_widedb(workdir: str, verbose: bool = False) -> str:
    """Create (or reuse) a >2^31-base DB + index (the wide-path regime,
    btypes.h:24-31) under workdir. Returns the index basename.

    2.2 Gbp fits this host's RAM for an in-memory SA-IS build (~50 GB
    peak); production nt-scale builds would use the blockwise path.
    """
    os.makedirs(workdir, exist_ok=True)
    base = os.path.join(workdir, "widedb")
    reads = os.path.join(workdir, "wide_reads.fq")
    if os.path.exists(base + ".1.cf") and os.path.exists(reads):
        return base

    rng = np.random.default_rng(SEED + 1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fa = os.path.join(workdir, "widedb.fa")
    conv = os.path.join(workdir, "wconv.dmp")
    nodes = os.path.join(workdir, "wnodes.dmp")
    names = os.path.join(workdir, "wnames.dmp")

    if not os.path.exists(fa):
        if verbose:
            print("generating 2.2 Gbp database ...", flush=True)
        with open(fa, "wb") as f, open(conv, "w") as cf:
            for g in range(WIDE_N_GENOMES):
                tid = 1000 + g
                seq = bases[rng.integers(0, 4, GENOME_LEN)]
                f.write(b">wseq%d wide benchmark genome\n" % g)
                f.write(b"\n".join(
                    seq[i: i + 80].tobytes()
                    for i in range(0, GENOME_LEN, 80)) + b"\n")
                cf.write(f"wseq{g}\t{tid}\n")
        with open(nodes, "w") as f:
            f.write("1\t|\t1\t|\tno rank\t|\n")
            for d in range(4):
                f.write(f"{10+d}\t|\t1\t|\tsuperkingdom\t|\n")
            for ge in range(16):
                f.write(f"{100+ge}\t|\t{10 + ge % 4}\t|\tgenus\t|\n")
            for s in range(WIDE_N_GENOMES):
                f.write(f"{1000+s}\t|\t{100 + s % 16}\t|\tspecies\t|\n")
        with open(names, "w") as f:
            f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
            for s in range(WIDE_N_GENOMES):
                f.write(f"{1000+s}\t|\tWideSpecies{s}\t|\t\t|\t"
                        "scientific name\t|\n")

    if not os.path.exists(base + ".1.cf"):
        if verbose:
            print("building 2.2 Gbp index (in-memory SA-IS) ...", flush=True)
        from ..build.builder import build_index
        build_index([fa], base, conv, nodes, names, verbose=verbose,
                    blockwise=False)

    if not os.path.exists(reads):
        if verbose:
            print("simulating 16k wide reads ...", flush=True)
        from .simulate import SimConfig, simulate
        simulate(fa, conv, os.path.join(workdir, "wide_reads"),
                 SimConfig(num_fragments=16384, read_length=150,
                           error_rate=0.002, seed=11))
    return base
