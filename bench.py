#!/usr/bin/env python3
"""Benchmark: end-to-end classification throughput on the synthetic DB.

Two phases:
  1. parity check -- the 3000 fixture reads must produce byte-identical
     output to the reference golden TSV (correctness gate);
  2. throughput -- 196k deterministic simulated reads (our evaluation
     simulator, fixed seed) streamed through the pipelined TPU engine,
     repeated 3x; the reported number is the MEDIAN run (the axon tunnel
     has >2x run-to-run variance).

Prints ONE JSON line with phase-2 reads/sec.

Baselines (BASELINE.md, measured on this host, round 1):
  * reference C++ centrifuge at -p 4 on the same 1 Mbp synth workload:
    ~167k reads/s ("ref_cpu_local" below);
  * the published "millions of reads within a few minutes on a desktop"
    claim (README.md:11-15) ~= 3333 reads/s, kept as vs_baseline for
    continuity with earlier rounds.

Both phases share ONE compiled kernel shape (lane/lmax floors): compiles
through the tunnel cost 1-3 min each and are not cached across processes.
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# NOTE: do NOT enable jax_compilation_cache_dir here -- the axon remote
# compile path hangs indefinitely when the persistent cache is active.

BASELINE_READS_PER_SEC = 3333.0
REF_CPU_LOCAL = 167000.0
FIXDIR = os.path.join(REPO, "tests", "fixtures", "synth")
# 32768-read batches (64k lanes): the search step has a ~200 us/step
# lane-count-independent floor; 64k lanes measured +5% e2e over 32k
# (97.7k vs 93.2k quiet, r5) on top of r4's +22% for 16k->32k
BATCH = 32768
# 6 batches/run (196k reads, same total as r4's 12x16k): short runs
# are fill/setup-dominated (~0.8 s fixed cost measured r4), and this
# amortizes it to <15% so the metric reflects streaming steady state;
# real workloads (millions of reads) amortize it to nothing.
N_THROUGHPUT_READS = 6 * BATCH  # full batches only: one jit shape set
N_STREAM_BATCHES = 12           # per timed run, via tiling the read list
TRIALS = 5                      # median of 5: the tunnel's dispatch-mood
                                # variance spans ~1.5x run to run


def _share_shapes(pipe):
    # both phases run at (2*BATCH lanes, one 32-wide length band):
    # one compile total (fixture + sim reads are both 150 bp -> 160)
    pipe.engine.lane_bucket_lo = 2 * BATCH
    pipe.engine.lmax_lo = 32


def main():
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.evaluation.simulate import SimConfig, simulate
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch
    from centrifuge_tpu.native.fmwalk import _load as _fmwalk_load
    from centrifuge_tpu.native.pack import _load as _pack_load
    from centrifuge_tpu.utils.fallback import fallbacks as native_fallbacks

    idx = load_cf_index(os.path.join(FIXDIR, "synth"))

    # one device-resident index shared by every pipeline below: each
    # device_put costs ~50 ms of tunnel dispatch regardless of size, so
    # rebuilding the DeviceFMIndex per trial added ~0.5 s/run of fixed
    # cost that real deployments (one load, millions of reads) never pay
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex
    from centrifuge_tpu.classify.pipeline import PipelineConfig
    dfm = DeviceFMIndex.build(
        idx, keep_host_blocks=PipelineConfig().host_resolve)

    # ---- phase 1: byte parity on the fixture reads ----
    fixture_reads = read_batch([os.path.join(FIXDIR, "reads.fq")])
    pipe = TPUClassificationPipeline(idx, dfm=dfm)
    _share_shapes(pipe)
    rows = [pipe.formatter.header()]
    for chunk in pipe.classify_stream_unpaired(
            fixture_reads[i: i + BATCH]
            for i in range(0, len(fixture_reads), BATCH)):
        rows += chunk
    golden = open(os.path.join(FIXDIR, "golden_output.tsv")).read().splitlines()
    parity_ok = rows == golden

    # ---- phase 2: throughput on 196k simulated reads, median of 3 ----
    sim_prefix = os.path.join(
        "/tmp", f"cftpu_bench_sim_{N_THROUGHPUT_READS}")
    if not os.path.exists(sim_prefix + ".fq"):
        simulate(os.path.join(FIXDIR, "db.fa"),
                 os.path.join(FIXDIR, "conv.dmp"), sim_prefix,
                 SimConfig(num_fragments=N_THROUGHPUT_READS,
                           read_length=150, error_rate=0.002, seed=42))
    reads = read_batch([sim_prefix + ".fq"])[:N_THROUGHPUT_READS]
    if len(reads) < N_THROUGHPUT_READS:
        # a truncated sim file (e.g. a killed earlier run) must fail
        # loudly, not hang the tiling loop below
        raise SystemExit(
            f"bench: {sim_prefix}.fq has {len(reads)} reads, expected "
            f"{N_THROUGHPUT_READS}; delete it and rerun")
    # tile to 12 batches per timed run: the ~0.8 s fill/fixed cost drops
    # to <8% of the run, so the median reflects streaming steady state
    while len(reads) < N_STREAM_BATCHES * BATCH:
        reads = reads + reads
    reads = reads[: N_STREAM_BATCHES * BATCH]

    # warmup at the shared shape (phase 1 already compiled it; this warms
    # the 150bp data path itself)
    pipe = TPUClassificationPipeline(idx, dfm=dfm)
    _share_shapes(pipe)
    for _ in pipe.classify_stream_unpaired(
            reads[i: i + BATCH] for i in range(0, BATCH, BATCH)):
        pass

    runs = []
    for _ in range(TRIALS):
        pipe = TPUClassificationPipeline(idx, dfm=dfm)
        _share_shapes(pipe)
        t0 = time.perf_counter()
        for chunk in pipe.classify_stream_unpaired(
                reads[i: i + BATCH] for i in range(0, len(reads), BATCH)):
            pass
        runs.append(len(reads) / (time.perf_counter() - t0))

    # ---- phase 2b: paired throughput (half the reference's interface,
    # classifier.h:226,530-535). 8192 pairs/batch = the same 32k-lane
    # kernel shape as phase 2, so no extra search compile. ----
    n_pairs = 6 * (BATCH // 2)  # 6 batches: steady state past pipeline fill
    pair_prefix = os.path.join("/tmp", f"cftpu_bench_pairs_{n_pairs}")
    if not os.path.exists(pair_prefix + "_1.fq"):
        simulate(os.path.join(FIXDIR, "db.fa"),
                 os.path.join(FIXDIR, "conv.dmp"), pair_prefix,
                 SimConfig(num_fragments=n_pairs, read_length=150,
                           error_rate=0.002, seed=43, paired=True))
    m1 = read_batch([pair_prefix + "_1.fq"])
    m2 = read_batch([pair_prefix + "_2.fq"])
    pairs = list(zip(m1, m2))[:n_pairs]
    # tile to 12 batches, matching the unpaired phase's fixed-cost
    # amortization (an asymmetric fill share would bias the
    # unpaired-vs-paired ratio)
    while pairs and len(pairs) < N_STREAM_BATCHES * (BATCH // 2):
        pairs = pairs + pairs
    pairs = pairs[: N_STREAM_BATCHES * (BATCH // 2)]
    pb = BATCH // 2              # BATCH//2 pairs = the same lane shape
    pipe = TPUClassificationPipeline(idx, dfm=dfm)
    _share_shapes(pipe)
    for _ in pipe.classify_stream_paired([pairs[:pb]]):
        pass  # warmup (native paired tail)
    pruns = []
    for _ in range(TRIALS):
        pipe = TPUClassificationPipeline(idx, dfm=dfm)
        _share_shapes(pipe)
        t0 = time.perf_counter()
        for _ in pipe.classify_stream_paired(
                pairs[i: i + pb] for i in range(0, len(pairs), pb)):
            pass
        pruns.append(len(pairs) / (time.perf_counter() - t0))
    pps = statistics.median(pruns)

    # ---- phase 3: device-only search time (variance-robust secondary
    # metric). The e2e number rides the axon tunnel, whose run-to-run
    # variance is >2x; this one is a device-side block (scalar checksum
    # output, upload excluded), stable to a few percent, so engine
    # regressions can't hide behind tunnel noise. ----
    from centrifuge_tpu.evaluation.prof import _time_device_only
    units = pipe._prep_unpaired(reads[:BATCH])
    lane_seqs = [s for unit in units for fw, rc in unit for s in (fw, rc)]
    dev_s = _time_device_only(pipe.engine, lane_seqs, batches=5,
                              lane_lo=2 * BATCH)

    rps = statistics.median(runs)
    print(json.dumps({
        "metric": "reads_per_sec_e2e_synth",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "vs_ref_cpu_local": round(rps / REF_CPU_LOCAL, 3),
        "runs": [round(r, 1) for r in runs],
        "reads": len(reads),
        "device_search_ms_per_batch": round(dev_s * 1e3, 1),
        "device_batch_lanes": 2 * BATCH,
        "paired_pairs_per_sec": round(pps, 1),
        "paired_runs": [round(r, 1) for r in pruns],
        "parity_ok": parity_ok,
        "native_engine": pipe.native is not None,
        # all three hot-path native extensions must be live; a broken
        # toolchain silently costing 2-10x must show up here (each
        # loader also prints a one-line stderr warning on fallback)
        "native_pack": _pack_load() is not None,
        "native_fmwalk": _fmwalk_load() is not None,
        "native_ok": (pipe.native is not None
                      and _pack_load() is not None
                      and _fmwalk_load() is not None),
        "native_fallbacks": native_fallbacks(),
    }))


if __name__ == "__main__":
    main()
