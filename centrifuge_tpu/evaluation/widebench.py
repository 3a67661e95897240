"""Wide-path (>=2^31 bases) end-to-end benchmark + reference byte parity.

Builds nothing itself: expects a wide-regime index (use
``evaluation/bigdb.py`` with ``--bases`` >= 2.2e9 and the repo builder,
or the reference ``centrifuge-build``) plus a FASTQ of reads.

Measures median-of-3 e2e throughput through the TPU pipeline on the
wide (64-bit occ) device layout, then byte-compares the TSV against the
reference binary run with ``--reorder`` (the reference's multithreaded
sink emits rows out of read order without it; content is identical, so
the comparison must pin ordering — see centrifuge.cpp:2806-2814).

Round-2 measured result (2.2 Gbp index, real TPU chip, axon tunnel):
733 reads/s median, byte-identical to the reference binary
(WIDEBENCH_r02.json at the repo root).

Usage:
    python -m centrifuge_tpu.evaluation.widebench <index_base> <reads.fq> \
        [--ref-binary /path/to/centrifuge-class] [--out out.json]
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

BATCH = 8192


def _paired_leg(args, idx, dfm):
    """Paired-end phase: 3 timed classify_stream_paired passes over
    (reads, reads2) mate files + byte parity vs the reference binary run
    with ``-1/-2 --reorder`` (paired scoring semantics:
    classifier.h:226,530-535 — a pair is one unit, both-mate hit sum).

    Returns a dict merged into the widebench JSON.
    """
    import statistics
    import subprocess
    import time

    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.io.fastx import read_batch

    B = args.batch
    m1 = read_batch([args.reads])
    m2 = read_batch([args.reads2])
    n_pairs = min(len(m1), len(m2), args.reads_count)
    n_pairs = (n_pairs // B) * B
    pairs = list(zip(m1[:n_pairs], m2[:n_pairs]))
    print(f"paired leg: {n_pairs} pairs, batch {B}", flush=True)

    pipe = TPUClassificationPipeline(idx, dfm=dfm)
    t0 = time.time()
    for _ in pipe.classify_stream_paired([pairs[:B]]):
        pass
    print(f"paired warmup+compile: {time.time()-t0:.1f}s", flush=True)

    runs = []
    rows = []
    for _ in range(3):
        pipe2 = TPUClassificationPipeline(idx, dfm=dfm)
        t0 = time.time()
        rows = [pipe2.formatter.header()]
        for chunk in pipe2.classify_stream_paired(
                pairs[i: i + B] for i in range(0, n_pairs, B)):
            rows += chunk
        runs.append(n_pairs / (time.time() - t0))
        print(f"paired run: {runs[-1]:.1f} pairs/s", flush=True)
    ours = "\n".join(rows) + "\n"

    parity = None
    ref_t = None
    if args.ref_binary:
        ref_out = args.index_base + ".refparity.paired.tsv"
        t0 = time.time()
        r = subprocess.run(
            [args.ref_binary, "-x", args.index_base,
             "-1", args.reads, "-2", args.reads2,
             "-u", str(n_pairs), "-p", "4", "--reorder", "-S", ref_out,
             "--report-file", "/dev/null"],
            capture_output=True, text=True)
        ref_t = time.time() - t0
        print(f"paired reference rc: {r.returncode} ({ref_t:.1f}s)",
              flush=True)
        parity = open(ref_out).read() == ours
        print(f"paired parity: {parity}", flush=True)

    return {
        "pairs_per_sec": round(statistics.median(runs), 1),
        "mates_per_sec": round(2 * statistics.median(runs), 1),
        "runs": [round(x, 1) for x in runs],
        "pairs": n_pairs,
        "parity_vs_reference_binary": parity,
        "ref_cpu_total_seconds": round(ref_t, 1) if ref_t else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("index_base")
    ap.add_argument("reads")
    ap.add_argument("--reads2", default=None,
                    help="mate-2 FASTQ: adds a paired-end leg (paired "
                         "scoring doubles lanes and exercises "
                         "_finish_paired; reference semantics "
                         "classifier.h:226,530-535)")
    ap.add_argument("--ref-binary", default=None,
                    help="reference centrifuge-class for the parity leg")
    ap.add_argument("--ref-tsv", default=None,
                    help="pre-generated reference TSV (from centrifuge-class "
                         "--reorder on the same index/reads) to byte-compare "
                         "instead of running the binary")
    ap.add_argument("--reads-count", type=int, default=2 * BATCH)
    ap.add_argument("--batch", type=int, default=BATCH,
                    help="reads per device batch (32k lanes measured "
                         "faster than 16k; steady-state pipelining needs "
                         ">= 4 batches)")
    ap.add_argument("--out", default=None, help="write the JSON line here too")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)

    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch

    t0 = time.time()
    idx = load_cf_index(args.index_base)
    print(f"index loaded: bwt_len={idx.bwt_len} ({time.time()-t0:.1f}s)",
          flush=True)
    assert idx.bwt_len >= (1 << 31), "not in the wide regime!"

    B = args.batch
    reads = read_batch([args.reads])[:args.reads_count]
    n_full = (len(reads) // B) * B
    reads = reads[:n_full]
    t0 = time.time()
    pipe = TPUClassificationPipeline(idx)
    assert pipe.dfm.wide, "device index not on the wide path"
    print(f"device arrays built ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    for _ in pipe.classify_stream_unpaired([reads[:B]]):
        pass
    print(f"warmup+compile: {time.time()-t0:.1f}s", flush=True)

    runs = []
    rows = []
    for _ in range(3):
        # fresh pipeline state (species metrics carry across batches) but
        # the SAME device-resident index -- no re-pack / re-upload
        pipe2 = TPUClassificationPipeline(idx, dfm=pipe.dfm)
        t0 = time.time()
        rows = [pipe2.formatter.header()]
        for chunk in pipe2.classify_stream_unpaired(
                reads[i: i + B] for i in range(0, len(reads), B)):
            rows += chunk
        runs.append(len(reads) / (time.time() - t0))
        print(f"run: {runs[-1]:.1f} reads/s", flush=True)
    ours = "\n".join(rows) + "\n"

    parity = None
    ref_t = None
    ref_marginal = None
    if args.ref_tsv:
        parity = open(args.ref_tsv).read() == ours
    elif args.ref_binary:
        ref_out = args.index_base + ".refparity.tsv"
        t0 = time.time()
        # --reorder: the reference sink reorders rows across threads
        # without it, so byte comparison needs order pinned to read order.
        r = subprocess.run(
            [args.ref_binary, "-x", args.index_base, "-U", args.reads,
             "-u", str(len(reads)), "-p", "4", "--reorder", "-S", ref_out,
             "--report-file", "/dev/null"],
            capture_output=True, text=True)
        ref_t = time.time() - t0
        print(f"reference rc: {r.returncode} ({ref_t:.1f}s incl. index load)",
              flush=True)
        parity = open(ref_out).read() == ours
        # warm-cache MARGINAL rate: a second warm run at 1/3 the reads;
        # marginal = delta(reads)/delta(time) cancels index load + page
        # cache warmup (the honest CPU number, BASELINE.md:45-65)
        n_small = max(1, len(reads) // 3)
        t0 = time.time()
        subprocess.run(
            [args.ref_binary, "-x", args.index_base, "-U", args.reads,
             "-u", str(n_small), "-p", "4", "--reorder",
             "-S", ref_out + ".small", "--report-file", "/dev/null"],
            capture_output=True, text=True)
        ref_t_small = time.time() - t0
        if ref_t > ref_t_small:
            ref_marginal = (len(reads) - n_small) / (ref_t - ref_t_small)
        print(f"reference warm small run: {ref_t_small:.1f}s; marginal "
              f"{ref_marginal and round(ref_marginal, 1)} reads/s",
              flush=True)

    paired = None
    if args.reads2:
        paired = _paired_leg(args, idx, pipe.dfm)

    line = json.dumps({
        "metric": "wide_reads_per_sec_e2e",
        "value": round(statistics.median(runs), 1),
        "unit": "reads/s",
        "runs": [round(x, 1) for x in runs],
        "reads": len(reads),
        "bwt_len": int(idx.bwt_len),
        "deep_ftab": bool(pipe.dfm.nblk12),
        "parity_vs_reference_binary": parity,
        "ref_cpu_total_seconds": round(ref_t, 1) if ref_t else None,
        "ref_cpu_marginal_reads_per_sec":
            round(ref_marginal, 1) if ref_marginal else None,
        "paired": paired,
    })
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
