#!/usr/bin/env python3
"""Benchmark: end-to-end classification throughput on the synthetic DB.

Two phases:
  1. parity check -- the 3000 fixture reads must produce byte-identical
     output to the reference golden TSV (correctness gate);
  2. throughput -- 30k deterministic simulated reads (our evaluation
     simulator, fixed seed) streamed through the pipelined TPU engine.

Prints ONE JSON line with phase-2 reads/sec.

Baseline: the reference publishes only qualitative numbers ("millions of
reads ... within a few minutes" on a desktop, README.md:11-15). We take
1M reads / 300 s ~= 3333 reads/s as the 8-thread CPU centrifuge estimate
recorded in BASELINE.md; vs_baseline is measured/3333.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# NOTE: do NOT enable jax_compilation_cache_dir here -- the axon remote
# compile path hangs indefinitely when the persistent cache is active.

BASELINE_READS_PER_SEC = 3333.0
FIXDIR = os.path.join(REPO, "tests", "fixtures", "synth")
BATCH = 8192
N_THROUGHPUT_READS = 3 * BATCH  # full batches only: one jit shape set


def main():
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.evaluation.simulate import SimConfig, simulate
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch

    idx = load_cf_index(os.path.join(FIXDIR, "synth"))

    # ---- phase 1: byte parity on the fixture reads ----
    fixture_reads = read_batch([os.path.join(FIXDIR, "reads.fq")])
    pipe = TPUClassificationPipeline(idx)
    rows = [pipe.formatter.header()]
    for chunk in pipe.classify_stream_unpaired(
            fixture_reads[i: i + BATCH]
            for i in range(0, len(fixture_reads), BATCH)):
        rows += chunk
    golden = open(os.path.join(FIXDIR, "golden_output.tsv")).read().splitlines()
    parity_ok = rows == golden

    # ---- phase 2: throughput on 30k simulated reads ----
    sim_prefix = os.path.join("/tmp", "cftpu_bench_sim")
    if not os.path.exists(sim_prefix + ".fq"):
        # 150bp reads land in the same jit shape bucket as the fixture
        # reads, so phases 1 and 2 share compiles
        simulate(os.path.join(FIXDIR, "db.fa"),
                 os.path.join(FIXDIR, "conv.dmp"), sim_prefix,
                 SimConfig(num_fragments=N_THROUGHPUT_READS,
                           read_length=150, error_rate=0.002, seed=42))
    reads = read_batch([sim_prefix + ".fq"])[:N_THROUGHPUT_READS]
    n_full = (len(reads) // BATCH) * BATCH
    reads = reads[:n_full]

    # warmup at production shapes (jit compiles), then measure
    pipe = TPUClassificationPipeline(idx)
    for _ in pipe.classify_stream_unpaired(
            reads[i: i + BATCH] for i in range(0, 2 * BATCH, BATCH)):
        pass

    pipe = TPUClassificationPipeline(idx)
    t0 = time.perf_counter()
    n_rows = 0
    for chunk in pipe.classify_stream_unpaired(
            reads[i: i + BATCH] for i in range(0, len(reads), BATCH)):
        n_rows += len(chunk)
    dt = time.perf_counter() - t0

    rps = len(reads) / dt
    print(json.dumps({
        "metric": "reads_per_sec_e2e_synth",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "reads": len(reads),
        "seconds": round(dt, 3),
        "parity_ok": parity_ok,
        "native_engine": pipe.native is not None,
    }))


if __name__ == "__main__":
    main()
