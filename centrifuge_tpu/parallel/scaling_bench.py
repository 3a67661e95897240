"""Multi-host scaling-efficiency harness.

Run one copy per host/process:

    python -m centrifuge_tpu.parallel.scaling_bench \
        --coordinator host0:12555 --nprocs N --procid I \
        -x IDX -U READS.fq [--n-fm F] [--batch B] [--local-devices D]

Every process classifies its contiguous read shard over the global
(dp, fm) mesh and process 0 prints one JSON line with aggregate
reads/s. Scaling efficiency at N hosts = throughput(N) / (N *
throughput(1)).

On this development machine there is no multi-chip hardware, so the
harness runs on virtual CPU devices: that validates the wiring and the
merge, but oversubscribed CPU timings are NOT a hardware scaling
measurement -- run this on a real pod slice for the >=80% target
(BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _virtual_dp_leg(argv):
    """One dp-sweep point: classify a fixed per-device read count over a
    (dp, 1) mesh of virtual CPU devices; prints one JSON line."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, required=True)
    ap.add_argument("-x", dest="index", required=True)
    ap.add_argument("-U", dest="reads", required=True)
    ap.add_argument("--per-device-batch", type=int, default=2048)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from ..classify.tpu_pipeline import TPUClassificationPipeline
    from ..index.cf_io import load_cf_index
    from ..io.fastx import read_batch
    from .sharded import make_mesh

    idx = load_cf_index(args.index)
    mesh = make_mesh(args.dp, 1)
    pipe = TPUClassificationPipeline(idx, mesh=mesh)
    B = args.per_device_batch * args.dp       # weak scaling: fixed/device
    n = B * args.batches
    reads = read_batch([args.reads])
    while len(reads) < n:                     # tile if the file is short
        reads = reads + reads
    reads = reads[:n]
    for _ in pipe.classify_stream_unpaired([reads[:B]]):
        pass                                  # warmup/compile
    t0 = time.time()
    for _ in pipe.classify_stream_unpaired(
            reads[i: i + B] for i in range(0, n, B)):
        pass
    dt = time.time() - t0
    print(json.dumps({"dp": args.dp, "reads": n,
                      "reads_per_sec": round(n / dt, 1),
                      "seconds": round(dt, 3)}))
    return 0


def _sweep(argv):
    """Produce the scaling-efficiency artifact on this (single-chip,
    4-vCPU) machine: a dp=1/2/4/8 weak-scaling curve over virtual CPU
    devices plus 1-vs-2-vs-4-process multihost legs, with the honest
    caveat that oversubscribed CPU timings bound the wiring overhead,
    not real ICI/DCN hardware (BASELINE's >=80% target needs a pod
    slice; the ICI cost model lives in SHARDBENCH's collective census).
    Reference analog: pthread scaling, MANUAL.markdown:1000-1010."""
    import os
    import subprocess
    ap = argparse.ArgumentParser()
    ap.add_argument("-x", dest="index",
                    default="tests/fixtures/synth/synth")
    ap.add_argument("-U", dest="reads", default=None)
    ap.add_argument("--per-device-batch", type=int, default=2048)
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--with-dp-curve", action="store_true",
                    help="also run the dp=1/2/4/8 virtual-device curve "
                         "(DEMOTED: on a 4-vCPU host it measures core "
                         "oversubscription, not wiring -- r4 showed "
                         "0.19-0.47 'efficiencies' that were pure "
                         "scheduler noise)")
    ap.add_argument("--trials", type=int, default=3,
                    help="repeats of each multiprocess leg (the pinned "
                         "legs must reproduce within ~5%)")
    args = ap.parse_args(argv)
    if args.reads is None:
        # prefer bench.py's 196k sim file (a sub-second timed region
        # cannot resolve 5% efficiency deltas); the 3000-read fixture
        # is the last-resort fallback
        for sim in ("/tmp/cftpu_bench_sim_196608.fq",
                    "/tmp/cftpu_bench_sim_49152.fq"):
            if os.path.exists(sim):
                args.reads = sim
                break
        else:
            args.reads = "tests/fixtures/synth/reads.fq"

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    dp_curve = None
    if args.with_dp_curve:
        dp_curve = []
        for dp in (1, 2, 4, 8):
            r = subprocess.run(
                [sys.executable, "-m",
                 "centrifuge_tpu.parallel.scaling_bench",
                 "--virtual-dp", "--dp", str(dp), "-x", args.index,
                 "-U", args.reads,
                 "--per-device-batch", str(args.per_device_batch)],
                env=env, capture_output=True, text=True)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(r.stdout, r.stderr, file=sys.stderr)
                raise RuntimeError(f"dp={dp} leg failed")
            rec = json.loads(line[-1])
            rec["weak_efficiency"] = (
                round(rec["reads_per_sec"]
                      / (dp * dp_curve[0]["reads_per_sec"]), 3)
                if dp_curve else 1.0)
            dp_curve.append(rec)
            print(f"dp={dp}: {rec['reads_per_sec']} reads/s "
                  f"eff={rec['weak_efficiency']}", flush=True)

    # multiprocess weak-scaling legs, CPU-PINNED: every process gets 2
    # dedicated cores (taskset), so nprocs=1 vs nprocs=2 compares equal
    # per-process resources and the efficiency is not host-load-coupled.
    # nprocs=4 would need 16 cores under that policy; on this 4-core
    # host it is out of scope (r4's unpinned 4-proc leg measured the
    # scheduler, not the framework).
    host_curve = []
    for nprocs in (1, 2):
        runs = []
        for trial in range(args.trials):
            procs = []
            outs = []
            for pid in range(nprocs):
                cores = f"{2 * pid},{2 * pid + 1}"
                cmd = ["taskset", "-c", cores,
                       sys.executable, "-m",
                       "centrifuge_tpu.parallel.scaling_bench",
                       "--coordinator",
                       f"localhost:{12671 + 10 * nprocs + trial}",
                       "--nprocs", str(nprocs), "--procid", str(pid),
                       "--local-devices", "2",
                       "-x", args.index, "-U", args.reads,
                       "--batch", "1024", "--limit", str(49152 * nprocs)]
                procs.append(subprocess.Popen(
                    cmd, env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE, text=True))
            for p in procs:
                out, err = p.communicate(timeout=900)
                outs.append((p.returncode, out, err))
            line = [l for l in outs[0][1].splitlines()
                    if l.startswith("{")]
            if not line or any(rc for rc, _, _ in outs):
                for rc, out, err in outs:
                    print(rc, out[-500:], err[-1000:], file=sys.stderr)
                raise RuntimeError(f"nprocs={nprocs} leg failed")
            runs.append(json.loads(line[-1]))
            print(f"nprocs={nprocs} trial {trial}: "
                  f"{runs[-1]['aggregate_reads_per_sec']} reads/s",
                  flush=True)
        rates = sorted(r["aggregate_reads_per_sec"] for r in runs)
        # keep only fields that are constant across trials; per-run
        # seconds etc. from trial 0 would contradict the median rate
        rec = {k: runs[0][k] for k in
               ("metric", "nprocs", "n_fm", "per_process_reads")}
        rec["aggregate_reads_per_sec"] = rates[len(rates) // 2]
        rec["trial_rates"] = rates
        rec["trial_spread_pct"] = round(
            100 * (rates[-1] - rates[0]) / rates[len(rates) // 2], 1)
        rec["pinned_cores_per_process"] = 2
        rec["weak_efficiency"] = (
            round(rec["aggregate_reads_per_sec"]
                  / (nprocs * host_curve[0]["aggregate_reads_per_sec"]), 3)
            if host_curve else 1.0)
        host_curve.append(rec)
        print(f"nprocs={nprocs}: median "
              f"{rec['aggregate_reads_per_sec']} aggregate reads/s "
              f"eff={rec['weak_efficiency']} "
              f"spread={rec['trial_spread_pct']}%", flush=True)

    artifact = {
        "metric": "scaling_efficiency_virtual",
        "weak_scaling_multiprocess_curve": host_curve,
        "dp_virtual_curve": dp_curve,
        "dp_curve_note": (
            "omitted by default: on a 4-vCPU host the dp=4/8 virtual-"
            "device legs measure core oversubscription, not framework "
            "wiring (r4 measured 0.19-0.47 'efficiencies' that were "
            "scheduler noise)"),
        "hardware_caveat": (
            "Measured on ONE machine (4 vCPUs) with virtual CPU devices, "
            "2 dedicated cores per process (taskset): this bounds the "
            "multihost wiring + DCN-sync overhead with equalized "
            "per-process resources, but is NOT a hardware ICI/DCN "
            "measurement. Real multi-chip hardware is not available in "
            "this environment."),
        "ici_model": (
            "During search the dp axis issues NO cross-device "
            "collectives (reads are embarrassingly parallel; psums span "
            "only the fm subgroup -- SHARDBENCH collective census), so "
            "on a real pod slice dp scaling is bounded by per-host "
            "dispatch + output transport, both constant per device. "
            "The >=80%-at-2-hosts BASELINE target therefore hinges on "
            "the DCN host-sync path (multihost.sync_max per batch), "
            "~10-100 us/batch on DCN vs the ~0.5-1 s/batch device step: "
            "<0.1% overhead by the model. Model-derived, not measured."),
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--sweep" in argv:
        argv.remove("--sweep")
        return _sweep(argv)
    if "--virtual-dp" in argv:
        argv.remove("--virtual-dp")
        return _virtual_dp_leg(argv)
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--procid", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=None)
    ap.add_argument("-x", dest="index", required=True)
    ap.add_argument("-U", dest="reads", required=True)
    ap.add_argument("--n-fm", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="write this process's TSV shard here")
    args = ap.parse_args(argv)

    from . import multihost
    multihost.initialize(args.coordinator, args.nprocs, args.procid,
                         local_devices=args.local_devices)
    import jax
    from ..index.cf_io import load_cf_index
    from ..io.fastx import read_batch

    idx = load_cf_index(args.index)
    wide = idx.bwt_len >= (1 << 31)
    if wide:
        jax.config.update("jax_enable_x64", True)
    pipe = multihost.make_multihost_pipeline(idx, n_fm=args.n_fm,
                                             wide=wide)
    reads = read_batch([args.reads],
                       limit=args.limit or None)
    # equalize shard sizes so every process runs the same batch count
    per = len(reads) // args.nprocs
    mine = reads[args.procid * per: (args.procid + 1) * per]

    B = args.batch
    rows = []
    # warmup batch (compiles)
    for chunk in pipe.classify_stream_unpaired([mine[:B]]):
        pass
    t0 = time.time()
    for chunk in pipe.classify_stream_unpaired(
            mine[i: i + B] for i in range(0, per - per % B, B)):
        rows += chunk
    dt = time.time() - t0
    n_done = per - per % B
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(rows) + "\n")
    multihost.sync_max(n_done)  # barrier: all processes finished
    if args.procid == 0:
        print(json.dumps({
            "metric": "multihost_reads_per_sec",
            "nprocs": args.nprocs,
            "n_fm": args.n_fm,
            "per_process_reads": n_done,
            "per_process_seconds": round(dt, 3),
            "aggregate_reads_per_sec": round(args.nprocs * n_done / dt, 1),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
