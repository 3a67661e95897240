#!/usr/bin/env python3
"""Benchmark: end-to-end classification throughput on the synthetic DB.

Runs the TPU classification pipeline (device lockstep FM search + batched
SA resolution + host assignment) on the synth fixture (24 genomes ~1 MB,
3000 x 100 bp reads), verifies byte parity against the golden reference
output, and prints ONE JSON line with reads/sec.

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

BASELINE_READS_PER_SEC = 3333.0
FIXDIR = os.path.join(REPO, "tests", "fixtures", "synth")


def main():
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch

    idx = load_cf_index(os.path.join(FIXDIR, "synth"))
    reads = read_batch([os.path.join(FIXDIR, "reads.fq")])

    BATCH = 1024

    def batches(rs):
        for i in range(0, len(rs), BATCH):
            yield rs[i: i + BATCH]

    # warmup pass: triggers every jit compile at the production shapes
    pipe = TPUClassificationPipeline(idx)
    for _ in pipe.classify_stream_unpaired(batches(reads)):
        pass

    # steady-state measurement on a fresh pipeline (fresh metrics state)
    pipe = TPUClassificationPipeline(idx)
    t0 = time.perf_counter()
    rows = [pipe.formatter.header()]
    for chunk in pipe.classify_stream_unpaired(batches(reads)):
        rows += chunk
    dt = time.perf_counter() - t0

    golden = open(os.path.join(FIXDIR, "golden_output.tsv")).read().splitlines()
    correct = rows == golden

    rps = len(reads) / dt
    print(json.dumps({
        "metric": "reads_per_sec_e2e_synth",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "reads": len(reads),
        "seconds": round(dt, 3),
        "parity_ok": correct,
    }))


if __name__ == "__main__":
    main()
