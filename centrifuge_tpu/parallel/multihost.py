"""Multi-host (multi-process) classification over a global device mesh.

The reference's only scale axis is pthreads in one process
(centrifuge.cpp:2806-2814) plus a --file-parallel flag; this module is
the distributed-backend axis the TPU rebuild adds: N processes (one per
host) each drive their local devices, joined into one global (dp, fm)
mesh via `jax.distributed.initialize`. Reads are sharded per host (the
--file-parallel analog); every device step is a single SPMD program over
the global mesh, so BWT-range shards can span hosts and rank
reconstitution psums ride ICI/DCN.

SPMD discipline: every process must issue the SAME jitted calls with the
SAME shapes. The host side of classification is data-dependent
(extension-fixpoint rounds, resolve-row counts, hit-buffer overflow
re-runs), so all such decisions go through `sync_max` -- a tiny
all-gather on a host scalar -- and padded shapes, keeping the processes
in lockstep without changing any per-read result.

Validated by tests/test_multihost.py: 2 CPU processes x 8 virtual
devices classify disjoint read shards over one global mesh and their
merged output is byte-identical to the single-process golden TSV.
"""

from __future__ import annotations

import numpy as np

from .sharded import ShardedFMArrays, ShardedSearchEngine, _bucket


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_devices: int = None) -> None:
    """jax.distributed bring-up; call before any backend use."""
    import os
    if local_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def sync_max(value: int) -> int:
    """Global max of a host-side scalar across processes."""
    import jax
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils
    return int(np.max(multihost_utils.process_allgather(
        np.asarray([value], np.int64))))


class MultihostSearchEngine(ShardedSearchEngine):
    """ShardedSearchEngine over a global multi-process mesh.

    Each process packs only its own lanes; device inputs become global
    arrays via make_array_from_process_local_data, and outputs come back
    as the process's addressable shards. All data-dependent shape
    choices are globally synchronized.
    """

    def pack_transport2(self, seqs, lmax, nlanes):
        """Globally-synchronized transport mode: the 2-bit packing is
        only valid when a chunk is N-free, a LOCAL property -- if one
        process fell back to 4-bit (tmode 1) while another packed 2-bit
        (tmode 2), the processes would dispatch different jitted
        executables into one SPMD program (shape mismatch -> hang). Any
        process needing the fallback forces it everywhere."""
        rseqp, lengths, tmode = super().pack_transport2(seqs, lmax, nlanes)
        g_tmode = -sync_max(-tmode)   # global min
        if g_tmode != tmode:
            rseqp, lengths = self.pack_transport(seqs, lmax, nlanes)
            tmode = g_tmode
        return rseqp, lengths, tmode

    def __init__(self, sh: ShardedFMArrays, mesh, min_hitlen: int = 22):
        super().__init__(sh, mesh, min_hitlen)
        import jax
        self.nproc = jax.process_count()
        # processes own contiguous dp rows (jax.devices() is
        # process-major); fm must divide the local device count
        self.local_dp = self.n_dp // self.nproc
        assert self.n_dp % self.nproc == 0

    # ---- global-array plumbing ----

    def _to_dev(self, arr: np.ndarray, spec):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(*spec)), arr)

    def _from_dev(self, garr, local_rows: int) -> np.ndarray:
        # outputs replicated over fm appear once per fm member in
        # addressable_shards: keep one shard per distinct dp index
        uniq = {}
        for sh in garr.addressable_shards:
            uniq.setdefault(sh.index[0].start or 0, sh)
        shards = [uniq[k] for k in sorted(uniq)]
        return np.concatenate([np.asarray(s.data) for s in shards])[
            :local_rows]

    def _dims(self, seqs):
        # local lane bucket; every process must pick the same shape, so
        # bucket both dims globally
        lmax = _bucket(max((len(s) for s in seqs), default=1),
                       lo=self.lmax_lo)
        nlocal = _bucket(max(len(seqs), 1),
                         lo=max(self.lane_bucket_lo // self.nproc,
                                self.local_dp))
        lmax = sync_max(lmax)
        nlocal = sync_max(nlocal)
        return lmax, nlocal

    def _run_global(self, rseq_l, lengths_l, start_l, max_hits,
                    first_hit_only, tmode: int = 0):
        # compact=0 / no segments: multihost keeps every process on one
        # uniform packed-matrix output (pool budgets and compaction
        # capacity checks are per-shard data-dependent; mode 0 keeps the
        # SPMD programs trivially aligned). packed_input still applies.
        from .sharded import _unpack_search_outputs
        L_local = rseq_l.shape[0]
        packed = self._search(
            self._to_dev(rseq_l, ("dp", None)),
            self._to_dev(lengths_l, ("dp",)),
            self._to_dev(start_l, ("dp",)),
            max_hits=max_hits, first_hit_only=first_hit_only,
            compact=0, packed_input=tmode, segments=())
        local = self._from_dev(packed, L_local)
        return _unpack_search_outputs(local, max_hits, 0)

    def search_async(self, seqs, presolve: bool = False, khits: int = 5,
                     ihits: int = 200):
        lmax, nlocal = self._dims(seqs)
        rseq, lengths = self.pack(seqs, lmax, nlocal)
        start = np.zeros(nlocal, dtype=np.int32)
        mh = min(self.FIRST_MAX_HITS, lmax)
        out = self._run_global(rseq, lengths, start, mh, False)
        return (out, rseq, lengths, mh, lmax, nlocal)

    def search_collect(self, handle, L: int):
        out, rseq, lengths, mh, lmax, nlanes = handle
        out = self._handle_overflow(out, rseq, lengths, mh, lmax, nlanes)
        return [a[:L] for a in out], None

    def _run(self, rseq, lengths, start, max_hits, first_hit_only,
             pool: bool = False, tmode: int = 0, segs: tuple = ()):
        return self._run_global(rseq, lengths, start, max_hits,
                                first_hit_only, tmode=tmode)

    def _handle_overflow(self, out, rseq, lengths, mh, lmax, nlanes,
                         tmode: int = 0):
        over = np.nonzero(out[4] > mh)[0]
        mh2 = 2 * mh if over.shape[0] == 0 else min(
            _bucket(int(out[4].max()), lo=2 * mh), lmax)
        nover_l = _bucket(max(int(over.shape[0]), 1),
                          lo=max(32, self.local_dp))
        # every process re-runs when ANY process overflowed, with synced
        # shapes, to keep the SPMD programs aligned
        g_over = sync_max(int(over.shape[0]))
        if g_over == 0:
            return out
        mh2 = sync_max(mh2)
        nover_l = sync_max(nover_l)
        rseq2 = np.zeros((nover_l, rseq.shape[1]), dtype=rseq.dtype)
        rseq2[: over.shape[0]] = rseq[over]
        lengths2 = np.zeros(nover_l, dtype=np.int32)
        lengths2[: over.shape[0]] = lengths[over]
        full = self._run(rseq2, lengths2,
                         np.zeros(nover_l, dtype=np.int32), mh2, False,
                         tmode=tmode)
        wide = [np.zeros((nlanes, mh2), a.dtype) if a.ndim == 2 else a
                for a in out]
        for k in range(4):
            w = out[k].shape[1]
            wide[k][:, :w] = out[k]
            wide[k][over] = full[k][: over.shape[0]]
        wide[4] = out[4].copy()
        wide[4][over] = full[4][: over.shape[0]]
        wide[5] = out[5].copy()
        wide[5][over] = full[5][: over.shape[0]]
        return wide

    def search_first_hits(self, seqs, offsets: np.ndarray):
        # uniform chunk count across processes (extension misses differ
        # per host); pad with zero-length lanes
        L = len(seqs)
        g_L = sync_max(L)
        if g_L == 0:
            return [np.zeros((0, 1), np.int32)] * 4 + [
                np.zeros(0, np.int32)] * 2
        seqs = list(seqs) + [np.zeros(0, np.uint8)] * (g_L - L)
        offsets = np.concatenate(
            [np.asarray(offsets), np.zeros(g_L - L, np.int64)])
        out = super().search_first_hits(seqs, offsets)
        return [a[:L] for a in out]


def make_multihost_resolver(mesh, sh: ShardedFMArrays, engine):
    """Arbitrary-row resolver with globally synchronized pad shapes."""
    from .sharded import make_sharded_resolver
    base = make_sharded_resolver(mesh, sh)
    nproc_local_dp = engine.local_dp

    def resolve(rows):
        rows = np.asarray(rows)
        cap = sync_max(_bucket(max(rows.shape[0], 1),
                               lo=max(256, nproc_local_dp)))
        padded = np.zeros(cap, rows.dtype)
        padded[: rows.shape[0]] = rows
        garr = engine._to_dev(padded, ("dp",))
        out = base(garr)
        return engine._from_dev(out, rows.shape[0])

    resolve.wide = sh.wide
    return resolve


def make_multihost_pipeline(idx, cfg=None, n_fm: int = 1, wide=None):
    """Full classification pipeline over the global multi-process mesh.

    Every process must call this (and subsequently classify the same
    NUMBER of equally-bucketed batches) in lockstep; use shard_reads to
    split the input."""
    import jax
    from jax.sharding import Mesh
    from ..classify.tpu_pipeline import TPUClassificationPipeline
    from ..classify.pipeline import PipelineConfig

    devices = np.array(jax.devices())
    n_dp = devices.size // n_fm
    mesh = Mesh(devices.reshape(n_dp, n_fm), ("dp", "fm"))

    cfg = cfg or PipelineConfig()
    pipe = TPUClassificationPipeline.__new__(TPUClassificationPipeline)
    sharr = ShardedFMArrays.build(idx, n_fm, wide=wide)
    engine = MultihostSearchEngine(sharr, mesh,
                                   cfg.classifier.min_hitlen)
    resolver = make_multihost_resolver(mesh, sharr, engine)
    pipe._init_with_engine(idx, cfg, engine, resolver, sync=sync_max)
    return pipe


def shard_reads(reads, process_id: int, num_processes: int):
    """Contiguous equal shards (padded by truncation to equal batch
    counts is the caller's job); the --file-parallel analog."""
    per = (len(reads) + num_processes - 1) // num_processes
    return reads[process_id * per: (process_id + 1) * per]
