"""Sharded-engine measurement harness (SHARDBENCH artifact).

Two legs, answering the two open questions about BWT-range sharding
(parallel/sharded.py; the reference has no distributed analog -- its
only parallelism is pthreads over reads, centrifuge.cpp:2806-2814):

1. --real: sharding-ABSTRACTION overhead on the real chip. Runs the
   same workload through TPUClassificationPipeline twice -- plain
   BatchSearchEngine vs ShardedSearchEngine on a 1x1 (dp, fm) Mesh --
   and reports both rates. A 1x1 mesh performs every masked gather and
   psum the N-shard path performs (they are no-ops in value but not in
   execution), so the delta bounds what the shard_map machinery itself
   costs before any ICI traffic.

2. --cpu: collective CENSUS + ICI latency model on the virtual 8-device
   CPU mesh (1 dp x 8 fm). Counts the psums per search step from the
   compiled HLO (the ground truth for the "how many collectives ride
   ICI per LF step" question) and prints the resulting per-step ICI
   budget model for pod-slice hardware.

Usage:
    python -m centrifuge_tpu.parallel.shardbench --real [--out F]
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m centrifuge_tpu.parallel.shardbench --cpu [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
FIXDIR = os.path.join(REPO, "tests", "fixtures", "synth")
BATCH = 8192


def _mk_reads(n):
    from centrifuge_tpu.evaluation.simulate import SimConfig, simulate
    from centrifuge_tpu.io.fastx import read_batch
    sim_prefix = f"/tmp/cftpu_shardbench_{n}"
    if not os.path.exists(sim_prefix + ".fq"):
        simulate(os.path.join(FIXDIR, "db.fa"),
                 os.path.join(FIXDIR, "conv.dmp"), sim_prefix,
                 SimConfig(num_fragments=n, read_length=150,
                           error_rate=0.002, seed=42))
    return read_batch([sim_prefix + ".fq"])[:n]


def _run_pipe(pipe, reads, trials=3):
    rates, rows = [], []
    for _ in range(trials):
        t0 = time.time()
        rows = []
        for chunk in pipe.classify_stream_unpaired(
                reads[i: i + BATCH] for i in range(0, len(reads), BATCH)):
            rows += chunk
        rates.append(len(reads) / (time.time() - t0))
    return statistics.median(rates), rates, rows


def leg_real(out):
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.index.cf_io import load_cf_index

    idx = load_cf_index(os.path.join(FIXDIR, "synth"))
    reads = _mk_reads(2 * BATCH)

    plain = TPUClassificationPipeline(idx)
    plain.engine.lane_bucket_lo = 2 * BATCH
    plain.engine.lmax_lo = 32
    for _ in plain.classify_stream_unpaired([reads[:BATCH]]):
        pass  # compile
    p_rate, p_runs, p_rows = _run_pipe(plain, reads)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "fm"))
    shard = TPUClassificationPipeline(idx, mesh=mesh, n_fm=1)
    shard.engine.lane_bucket_lo = 2 * BATCH
    shard.engine.lmax_lo = 32
    for _ in shard.classify_stream_unpaired([reads[:BATCH]]):
        pass
    s_rate, s_runs, s_rows = _run_pipe(shard, reads)

    line = {
        "metric": "shard_abstraction_overhead",
        "plain_reads_per_sec": round(p_rate, 1),
        "plain_runs": [round(x, 1) for x in p_runs],
        "sharded_1x1_reads_per_sec": round(s_rate, 1),
        "sharded_runs": [round(x, 1) for x in s_runs],
        "overhead_pct": round(100 * (1 - s_rate / p_rate), 1),
        "rows_identical": p_rows == s_rows,
        "reads": len(reads),
        "note": "1x1 (dp, fm) mesh on the real chip: every masked "
                "gather/psum of the sharded path executes (values are "
                "no-ops), bounding the shard_map machinery cost",
    }
    print(json.dumps(line), flush=True)
    return line


def _time_device_only_sharded(eng, lane_seqs, batches=5, lane_lo=16384):
    """Sharded twin of evaluation.prof._time_device_only: jit the sharded
    search + a scalar checksum so the timed block is device-only (no
    download), matching the plain engine's instrument shape-for-shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from centrifuge_tpu.classify.engine import _bucket, _bucket_len
    maxlen = max(len(s) for s in lane_seqs)
    lmax = _bucket_len(maxlen, lo=eng.lmax_lo)
    nlanes = _bucket(len(lane_seqs), lo=lane_lo)
    rseqp, lengths, tmode = eng.pack_transport2(lane_seqs, lmax, nlanes)
    per = nlanes // eng.n_dp
    segs = eng._segments(per, maxlen)
    mh = min(eng.FIRST_MAX_HITS, lmax)
    compact = eng._compact_ok(lmax + eng.sh.ftab_chars, mh,
                              pool=per >= eng.pool_min_lanes)
    start = np.zeros(nlanes, np.int32)
    l = jnp.asarray(lengths)
    s = jnp.asarray(start)

    @jax.jit
    def run(rseq, lengths, start):
        packed = eng._search(rseq, lengths, start, max_hits=mh,
                             first_hit_only=False, compact=compact,
                             packed_input=tmode, segments=segs)
        return packed.astype(jnp.int32).sum()

    float(run(jnp.asarray(rseqp), l, s))   # compile
    ts = []
    for i in range(batches):
        # perturb one byte per run so the tunnel can't serve a cached
        # execution result (same trick as prof._time_device_only)
        rp = rseqp.copy()
        rp[-1, -1] = (i + 1) & 0xFF   # unique per run (cache-bust)
        r = jnp.asarray(rp)
        r.block_until_ready()
        t0 = time.perf_counter()
        float(run(r, l, s))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def leg_device(out):
    """Shard-abstraction overhead with a resolvable instrument: the
    device-only search block (scalar checksum, <3.5% spread) through the
    plain engine vs the 1x1-mesh sharded engine at identical shapes.
    Replaces the r4 e2e median-of-3 comparison whose >2x tunnel noise
    produced physically impossible negative overheads."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.evaluation.prof import _time_device_only
    from centrifuge_tpu.index.cf_io import load_cf_index

    idx = load_cf_index(os.path.join(FIXDIR, "synth"))
    reads = _mk_reads(BATCH)

    plain = TPUClassificationPipeline(idx)
    plain.engine.lane_bucket_lo = 2 * BATCH
    plain.engine.lmax_lo = 32
    units = plain._prep_unpaired(reads)
    lane_seqs = [s for unit in units for fw, rc in unit for s in (fw, rc)]
    t_plain = _time_device_only(plain.engine, lane_seqs, batches=5,
                                lane_lo=2 * BATCH)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "fm"))
    shard = TPUClassificationPipeline(idx, mesh=mesh, n_fm=1)
    shard.engine.lane_bucket_lo = 2 * BATCH
    shard.engine.lmax_lo = 32
    t_shard = _time_device_only_sharded(shard.engine, lane_seqs,
                                        batches=5, lane_lo=2 * BATCH)

    line = {
        "metric": "shard_abstraction_overhead_device_only",
        "plain_ms_per_batch": round(t_plain * 1e3, 1),
        "sharded_1x1_ms_per_batch": round(t_shard * 1e3, 1),
        "overhead_pct": round(100 * (t_shard / t_plain - 1), 1),
        "lanes": 2 * BATCH,
        "method": "jitted search + scalar checksum (no download), min of "
                  "5 perturbed runs each; the device-only block held "
                  "<3.5% spread in r4 while e2e tunnel noise exceeded "
                  "2x, so this instrument can resolve single-digit "
                  "overheads the r4 e2e comparison could not",
    }
    print(json.dumps(line), flush=True)
    return line


def leg_cpu(out):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.parallel.sharded import (ShardedFMArrays,
                                                 ShardedSearchEngine)

    n_fm = min(8, len(jax.devices()))
    idx = load_cf_index(os.path.join(FIXDIR, "synth"))
    mesh = Mesh(np.array(jax.devices()[:n_fm]).reshape(1, n_fm),
                ("dp", "fm"))
    sharr = ShardedFMArrays.build(idx, n_fm)
    eng = ShardedSearchEngine(sharr, mesh, 22)

    # collective census: compile the sharded search step and count the
    # all-reduces in the optimized HLO -- the ground truth for psums/step
    reads = _mk_reads(BATCH)
    lane_seqs = []
    for r in reads:
        lane_seqs.append(r.seq)
        lane_seqs.append(r.seq[::-1])  # stand-in rc; shapes match
    t0 = time.time()
    h = eng.search_async(lane_seqs)
    arrays, _ = eng.search_collect(h, len(lane_seqs))
    wall = time.time() - t0

    # ground-truth collective census from the compiled HLO of the
    # sharded search step (8-way unrolled while body)
    n_allreduce = None
    unroll = 8
    try:
        rseq, lengths = eng.pack(lane_seqs[:512], 160, 512)
        lowered = eng._search.lower(
            jnp.asarray(rseq), jnp.asarray(lengths),
            jnp.zeros(512, jnp.int32), max_hits=16, first_hit_only=False)
        n_allreduce = lowered.compile().as_text().count("all-reduce-start")
        if n_allreduce == 0:
            n_allreduce = lowered.compile().as_text().count("all-reduce(")
    except Exception:
        pass

    # static census: the composed ftab_lookup + lf_pair path issues 3
    # logical psums per search step (rank pair, topchar, ftab) -- but
    # the compiled HLO shows XLA combines them into ONE all-reduce per
    # unrolled step (hlo_allreduce_count == unroll), so the collective
    # latency is paid once per step with ~3 lane-vectors of payload.
    psums_per_step = 3
    fused_per_step = (n_allreduce / unroll) if n_allreduce else None
    # ICI model: one fused all-reduce of ~3 (L,)-lane vectors over the
    # fm ring. At L lanes x 8 B (wide rows), a bidirectional ring moves
    # 2*(n-1)/n * payload per link; v5e ICI ~ 45 GB/s/link + ~1 us/hop.
    L = 32768
    n_dev = 8
    payload = 3 * L * 8
    link_bw = 45e9
    per_step_us = (2 * (n_dev - 1) / n_dev * payload / link_bw * 1e6
                   + n_dev * 1.0)
    line = {
        "metric": "shard_cpu_census",
        "n_fm": n_fm,
        "lanes": len(lane_seqs),
        "search_wall_s": round(wall, 2),
        "psums_per_step_static": psums_per_step,
        "hlo_allreduce_count": n_allreduce,
        "hlo_allreduce_per_step": fused_per_step,
        "ici_model": {
            "lanes": L,
            "fused_payload_bytes": payload,
            "per_step_us_v5e_ring": round(per_step_us, 1),
            "note": "MODEL-DERIVED (assumed v5e link constants; only "
                    "the fused-allreduce census above is measured): "
                    "per-step gather cost on a multi-GB table is "
                    "~0.5-1 ms at 32k lanes (14-18 ns/row x 2L rows, "
                    "CLAUDE.md cost model), so ONE fused all-reduce per "
                    f"step at ~{per_step_us:.0f} us adds <10%: BWT-range "
                    "sharding is GO for >HBM indexes provided psums "
                    "ride ICI, and NO-GO over DCN (ms-class latency "
                    "per step would dominate)",
        },
    }
    print(json.dumps(line), flush=True)
    return line


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="device-only 1x1 overhead leg (the resolvable "
                         "instrument; run on the real chip)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    lines = []
    if args.real:
        lines.append(leg_real(args.out))
    if args.device:
        lines.append(leg_device(args.out))
    if args.cpu:
        lines.append(leg_cpu(args.out))
    if args.out and lines:
        with open(args.out, "a") as f:
            for ln in lines:
                f.write(json.dumps(ln) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
