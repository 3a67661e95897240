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


def main(argv=None):
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
