"""Multi-chip execution: data-parallel reads x BWT-range-sharded index.

The reference scales with pthreads over reads sharing one read-only index
(centrifuge.cpp:2806-2814); it has no distributed backend. The TPU-native
design generalizes both axes onto a 2-D `jax.sharding.Mesh`:

  * axis "dp": reads (lanes) are sharded -- pure data parallelism; each
    device runs the lockstep search loop on its lane slice.
  * axis "fm": the packed BWT block table, the ftab, and the SA sample are
    sharded by row range -- the analog of tensor parallelism, needed when
    the index exceeds one chip's HBM (the >=4 GB class the 64-bit index
    format exists for: btypes.h:24-31, README.md:41-43). Every rank query
    is answered by the shard owning that BWT row: each member computes a
    masked partial count and a `psum` over "fm" reconstitutes the full
    value on all members (collectives ride ICI).

Both the narrow (int32 rows) and the WIDE (>=2^31 bases, int64 rows,
64-bit occ checkpoints split lo/hi) block layouts are supported; wide is
exactly the regime BWT-range sharding exists for.

`ShardedSearchEngine` exposes the same search/resolve surface as the
single-chip BatchSearchEngine, so the full classification pipeline --
search, extension fixpoint, native assignment tail, selection, report --
runs unchanged on top of the mesh and produces byte-identical output
(tests/test_parallel.py asserts TSV equality against the single-chip
goldens).

Host-side merge of per-shard metrics mirrors the reference's mutex merge
(centrifuge.cpp:2752) as a psum epilogue.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..index.cf_io import CFIndex
from ..ops.fm_jax import (BLOCK_BASES, WORDS_PER_BLOCK, _fchr_select,
                          _rank_from_rows, _select_col, pack_bwt_blocks,
                          pack_ftab_rows, rank_in_block)
from ..classify.engine import (FMKernels, POOL_SLOTS_PER_LANE, _bucket,
                               _bucket_len, _pack_search_outputs,
                               _start_host_copy, _unpack_pool_outputs,
                               _unpack_search_outputs, _unpack_transport,
                               search_loop)


def _pad_to(arr: np.ndarray, mult: int, fill=0) -> np.ndarray:
    n = arr.shape[0]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return arr
    pad_shape = (target - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)], axis=0)


@dataclass
class ShardedFMArrays:
    """Host-prepped, fm-axis-padded index arrays + geometry."""

    blocks: np.ndarray      # uint32[nblk_pad, 36|40]
    ufm: np.ndarray         # uint32[nblk_pad + nfr_pad, 36|40]: per-shard
                            # interleave of [block rows | packed ftab
                            # rows] so each fm shard's slice is its local
                            # unified table (ONE gather serves both the
                            # rank and the start-lane ftab read, the
                            # single-chip fused_step_lookup1 geometry)
    nfr_per: int            # packed ftab rows per fm shard
    fchr: np.ndarray        # row-dtype[5] (replicated)
    ftab_tb: np.ndarray     # row-dtype[4^fc, 2] stacked (top, bot)
    offs: np.ndarray        # int32[offs_pad]
    boundary_rows: np.ndarray   # row-dtype[nb] (replicated; tiny)
    boundary_refs: np.ndarray   # int32[nb]
    zoff: int
    bwt_len: int
    offrate: int
    npat: int
    n_fm: int
    wide: bool
    ftab_chars: int = 10

    @property
    def row_dtype(self):
        return np.int64 if self.wide else np.int32

    @property
    def word_off(self) -> int:
        return 8 if self.wide else 4

    @property
    def nblk_per(self) -> int:
        return self.blocks.shape[0] // self.n_fm

    @property
    def nftab_per(self) -> int:
        return self.ftab_tb.shape[0] // self.n_fm

    @property
    def noffs_per(self) -> int:
        return self.offs.shape[0] // self.n_fm

    @staticmethod
    def build(idx: CFIndex, n_fm: int, wide: bool = None) -> "ShardedFMArrays":
        if wide is None:
            wide = idx.bwt_len >= (1 << 31)
        if wide and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "index >= 2^31 bases needs the wide path: enable 64-bit "
                "mode first (jax.config.update('jax_enable_x64', True))")
        rows = pack_bwt_blocks(idx.bwt, wide)
        it = np.int64 if wide else np.int32

        if (1 << (2 * idx.ftab_chars)) % n_fm != 0:
            raise ValueError("ftab size must divide the fm axis")
        rows_p = _pad_to(rows, n_fm)
        width = rows_p.shape[1]
        frows_p = _pad_to(
            pack_ftab_rows(idx.ftab_top, idx.ftab_bot, wide, width), n_fm)
        nblk_per = rows_p.shape[0] // n_fm
        nfr_per = frows_p.shape[0] // n_fm
        stride = nblk_per + nfr_per
        ufm = np.empty((n_fm * stride, width), np.uint32)
        for i in range(n_fm):
            ufm[i * stride: i * stride + nblk_per] = \
                rows_p[i * nblk_per: (i + 1) * nblk_per]
            ufm[i * stride + nblk_per: (i + 1) * stride] = \
                frows_p[i * nfr_per: (i + 1) * nfr_per]
        return ShardedFMArrays(
            blocks=rows_p,
            ufm=ufm,
            nfr_per=nfr_per,
            fchr=idx.fchr.astype(it),
            ftab_tb=np.stack([idx.ftab_top.astype(it),
                              idx.ftab_bot.astype(it)], axis=1),
            offs=_pad_to(idx.offs.astype(np.int32), n_fm),
            boundary_rows=idx.boundary_rows.astype(it),
            boundary_refs=idx.boundary_refidx.astype(np.int32),
            zoff=int(idx.zoff),
            bwt_len=int(idx.bwt_len),
            offrate=int(idx.offrate),
            npat=int(idx.npat),
            n_fm=n_fm,
            wide=wide,
            ftab_chars=int(idx.ftab_chars),
        )


def _shard_kernels(sh: ShardedFMArrays, blocks_l, fchr, ftab_tb_l, zoff,
                   axis: str) -> FMKernels:
    """FMKernels over a local BWT-range slice: masked gather + psum."""
    nblk_per = sh.nblk_per
    nftab_per = sh.nftab_per
    word_off = sh.word_off
    fm_idx = jax.lax.axis_index(axis)
    idt = jnp.int64 if sh.wide else jnp.int32
    blk_base = (fm_idx * nblk_per).astype(idt)
    ftab_base = (fm_idx * nftab_per).astype(jnp.int32)

    def rank(rows, chars):
        blk = (rows >> 9) - blk_base
        valid = (blk >= 0) & (blk < nblk_per)
        data = blocks_l[jnp.clip(blk, 0, nblk_per - 1)]
        r = rank_in_block(data, rows & 511, chars, zoff, rows, word_off)
        return jax.lax.psum(jnp.where(valid, r, 0), axis)

    def lf(rows, chars):
        return _fchr_select(fchr, chars) + rank(rows, chars)

    def bwt_char(rows):
        blk = (rows >> 9) - blk_base
        valid = (blk >= 0) & (blk < nblk_per)
        data = blocks_l[jnp.clip(blk, 0, nblk_per - 1)]
        within = (rows & 511).astype(jnp.int32)
        word = data[jnp.arange(rows.shape[0]), word_off + (within >> 4)]
        ch = ((word >> (2 * (within & 15).astype(jnp.uint32))) & 3
              ).astype(jnp.int32)
        return jax.lax.psum(jnp.where(valid, ch, 0), axis)

    def lf_pair(rows_t, rows_b, chars):
        B = rows_t.shape[0]
        rows = jnp.concatenate([rows_t, rows_b])
        ch2 = jnp.concatenate([chars, chars])
        blk = (rows >> 9) - blk_base
        valid = (blk >= 0) & (blk < nblk_per)
        data = blocks_l[jnp.clip(blk, 0, nblk_per - 1)]
        within = rows & 511
        r = rank_in_block(data, within, ch2, zoff, rows, word_off)
        r = jax.lax.psum(jnp.where(valid, r, 0), axis)
        lf2 = _fchr_select(fchr, ch2) + r
        word = data[jnp.arange(2 * B),
                    word_off + (within.astype(jnp.int32) >> 4)]
        ch = ((word >> (2 * (within & 15).astype(jnp.uint32))) & 3
              ).astype(jnp.int32)
        topchar = jax.lax.psum(jnp.where(valid[:B], ch[:B], 0), axis)
        return lf2[:B], lf2[B:], topchar

    def ftab_lookup(fi):
        li = fi - ftab_base
        valid = (li >= 0) & (li < nftab_per)
        lic = jnp.clip(li, 0, nftab_per - 1)
        tb = ftab_tb_l[lic]
        tb = jnp.where(valid[:, None], tb, 0)
        tb = jax.lax.psum(tb, axis)
        return tb[:, 0], tb[:, 1]

    nfr_per = sh.nfr_per
    fr_base = (fm_idx * nfr_per).astype(idt)
    per_shift = 3 if sh.wide else 4   # packed ftab entries per row

    def step_lookup1(starting, pending, fi, top, bot, chars):
        """Sharded one-row-per-lane step (the fm-axis analog of
        fm_jax.fused_step_lookup1): each shard gathers ONE local row
        from its unified [blocks | packed ftab] slice -- the start
        lane's ftab row, the extending lane's top block, or bot's block
        for deferred lanes. Ownership-masked extractions reconstitute
        through psums, which XLA fuses into one all-reduce per step
        (SHARDBENCH census)."""
        f_l = (fi >> per_shift).astype(idt) - fr_base
        fvalid = (f_l >= 0) & (f_l < nfr_per)
        blk_t = top >> 9
        prow_g = jnp.where(pending, bot >> 9, blk_t)
        b_l = prow_g - blk_base
        bvalid = (b_l >= 0) & (b_l < nblk_per)
        lrow = jnp.where(
            starting,
            nblk_per + jnp.clip(f_l, 0, nfr_per - 1),
            jnp.clip(b_l, 0, nblk_per - 1))
        g = blocks_l[lrow]                        # (L, W): ONE gather

        # --- ftab extraction (start lanes; layout = pack_ftab_rows) ---
        if sh.wide:
            q = ((fi & 7) * 4).astype(jnp.int32)
            tlo = _select_col(g, q).astype(jnp.int64)
            thi = _select_col(g, q + 1).astype(jnp.int64)
            blo = _select_col(g, q + 2).astype(jnp.int64)
            bhi = _select_col(g, q + 3).astype(jnp.int64)
            ftop = tlo | (thi << 32)
            fbot = blo | (bhi << 32)
        else:
            p = ((fi & 15) * 2).astype(jnp.int32)
            ftop = _select_col(g, p).astype(jnp.int32)
            fbot = _select_col(g, p + 1).astype(jnp.int32)

        # --- rank/topchar extraction (extending/pending lanes) ---
        in_reach = bot <= (blk_t + 1) * 512
        within_t = (top & 511).astype(jnp.int32)
        within_b = jnp.where(
            pending, (bot & 511).astype(jnp.int32),
            jnp.clip(bot - (blk_t << 9), 0, 512).astype(jnp.int32))
        r_t = _rank_from_rows(g, within_t, chars, zoff, top, word_off)
        r_b = _rank_from_rows(g, within_b, chars, zoff, bot, word_off)
        word = _select_col(g[:, word_off:], within_t >> 4)
        ch = ((word.astype(jnp.uint32)
               >> (2 * (top & 15).astype(jnp.uint32))) & 3
              ).astype(jnp.int32)

        # ownership masks pick the single contributing shard per lane;
        # a start lane's row holds ftab data (its "rank" extraction is
        # garbage) and vice versa, so each value masks on its own phase
        fmask = starting & fvalid
        bmask = ~starting & bvalid
        z = jnp.asarray(0, idt)
        ftop = jax.lax.psum(jnp.where(fmask, ftop, z), axis)
        fbot = jax.lax.psum(jnp.where(fmask, fbot, z), axis)
        r_t = jax.lax.psum(jnp.where(bmask, r_t, z), axis)
        r_b = jax.lax.psum(jnp.where(bmask, r_b, z), axis)
        topchar = jax.lax.psum(jnp.where(bmask, ch, 0), axis)
        base = _fchr_select(fchr, chars)
        return ftop, fbot, base + r_t, base + r_b, topchar, in_reach

    return FMKernels(ftab_lookup=ftab_lookup, lf_pair=lf_pair, lf=lf,
                     bwt_char=bwt_char, zoff=zoff,
                     num_ftab=sh.ftab_tb.shape[0], row_dtype=idt,
                     step_lookup1=step_lookup1)


def _device_arrays(mesh: Mesh, sh: ShardedFMArrays):
    # make_array_from_callback slices the (host-replicated) array per
    # device index, which is correct in BOTH single- and multi-process
    # meshes (device_put with a global sharding mis-places shards when
    # the mesh spans processes)
    #
    # Cached per (sh, mesh): the search-step factory and the resolver
    # factory both need these; uploading twice would double the HBM
    # footprint of the multi-GB unified table. After the upload the
    # host-side ufm copy is dropped (blocks stays: HostResolver walks
    # it) -- a second mesh over one ShardedFMArrays must rebuild it.
    cached = getattr(sh, "_dev_cache", None)
    if cached is not None and cached[0] is mesh:
        return cached[1]
    if sh.ufm is None:
        raise RuntimeError(
            "ShardedFMArrays host ufm was released after its first device "
            "upload; build a fresh ShardedFMArrays for a new mesh")
    def put(arr, *spec):
        shd = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_callback(arr.shape, shd,
                                            lambda i: arr[i])
    dev = (
        # the unified table: each fm shard's slice is [its block rows |
        # its packed ftab rows]; block indexes < nblk_per stay valid, so
        # every kernel (rank walks included) reads the same array
        put(sh.ufm, "fm", None),
        put(sh.fchr),
        put(sh.ftab_tb, "fm", None),
        put(sh.offs, "fm"),
        put(sh.boundary_rows),
        put(sh.boundary_refs),
    )
    sh._dev_cache = (mesh, dev)
    sh.ufm = None
    return dev


def _sharded_try_offset(sh: ShardedFMArrays, offs_l, brows, brefs, zoff):
    """try_offset over a sharded SA sample: masked local lookup + psum."""
    offrate = sh.offrate
    sample_mask = (1 << offrate) - 1
    noffs_per = sh.noffs_per
    narrow_pat = sh.npat <= 0xFFFF
    has_bounds = sh.boundary_rows.shape[0] > 0
    fm_idx = jax.lax.axis_index("fm")
    offs_base = (fm_idx * noffs_per).astype(jnp.int32)

    def try_offset(rows):
        tidx = jnp.full(rows.shape, -1, jnp.int32)
        sampled = (rows & sample_mask) == 0
        li = (rows >> offrate).astype(jnp.int32) - offs_base
        lvalid = (li >= 0) & (li < noffs_per)
        sval = jnp.where(lvalid, offs_l[jnp.clip(li, 0, noffs_per - 1)], 0)
        sval = jax.lax.psum(sval, "fm")
        tidx = jnp.where(sampled, sval, tidx)
        if has_bounds:
            pos = jnp.searchsorted(brows, rows)
            posc = jnp.clip(pos, 0, brows.shape[0] - 1)
            is_b = (brows[posc] == rows) & ~sampled
            bval = brefs[posc]
            if narrow_pat:
                bval = bval & 0xFFFF
            last = brows[-1]
            is_b = is_b & (last > 0) & (rows <= last)
            tidx = jnp.where(is_b, bval, tidx)
        return jnp.where(rows == zoff, 0, tidx)

    return try_offset


def make_sharded_search(mesh: Mesh, sh: ShardedFMArrays,
                        min_hitlen: int = 22):
    """Jitted full-scan search over the (dp, fm) mesh.

    Returns fn(rseq, lengths, start, max_hits, first_hit_only, compact,
    packed_input, segments) mirroring the single-chip
    batched_search_packed: reads arrive transport-packed (2 or 4 codes
    per byte), the search loop runs with lockstep survivor compaction
    (`segments`), and all outputs leave the device as ONE packed array
    per dp shard (`compact` modes incl. the dense hit pool) -- the same
    three optimizations the single-chip engine carries, so the fm axis
    costs only its collectives, not a different (slower) engine."""
    increment = 10 if 2 * min_hitlen <= 33 else 2 * min_hitlen - 33
    zoff = jnp.asarray(sh.zoff, jnp.int64 if sh.wide else jnp.int32)
    dev = _device_arrays(mesh, sh)

    @functools.partial(jax.jit, static_argnames=(
        "max_hits", "first_hit_only", "compact", "packed_input",
        "segments"))
    def step(rseq, lengths, start, max_hits: int, first_hit_only: bool,
             compact: int = 0, packed_input: int = 0,
             segments: tuple = ()):
        def body(blocks_l, fchr, ftab_tb_l, offs_l, brows, brefs,
                 rseq, lengths, start):
            kern = _shard_kernels(sh, blocks_l, fchr, ftab_tb_l, zoff, "fm")
            rs = _unpack_transport(rseq, packed_input)
            res = search_loop(kern, rs, lengths, start, min_hitlen,
                              increment, max_hits, first_hit_only,
                              segments=segments)
            return _pack_search_outputs(*res, kern.row_dtype, compact)

        # pool modes emit a 1-D [pool | (nibbles) | tail] chunk per dp
        # shard; matrix modes emit (lanes_per, C) rows -- both concatenate
        # lane-major over dp
        out_spec = P("dp") if compact in (3, 4, 5, 6) else P("dp", None)
        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(P("fm", None), P(), P("fm", None), P("fm"), P(), P(),
                      P("dp", None), P("dp"), P("dp")),
            out_specs=out_spec,
            check_vma=False,
        )
        return mapped(*dev, rseq, lengths, start)

    return step


def make_sharded_resolver(mesh: Mesh, sh: ShardedFMArrays,
                          max_steps: int = 4096):
    """Jitted arbitrary-row SA resolver over the mesh: rows are
    dp-sharded, each LF-walk step is a masked local rank + psum over fm
    (the sharded analog of ops/fm_jax.resolve_rows_core)."""
    zoff = jnp.asarray(sh.zoff, jnp.int64 if sh.wide else jnp.int32)
    dev = _device_arrays(mesh, sh)

    @jax.jit
    def resolve(rows):
        def body(blocks_l, fchr, ftab_tb_l, offs_l, brows, brefs, rows):
            kern = _shard_kernels(sh, blocks_l, fchr, ftab_tb_l, zoff, "fm")
            try_offset = _sharded_try_offset(sh, offs_l, brows, brefs, zoff)

            def cond(state):
                rows, tidx, it = state
                return (tidx < 0).any() & (it < max_steps)

            def walk(state):
                rows, tidx, it = state
                unresolved = tidx < 0
                step_rows = jnp.where(unresolved, rows, 0)
                c = kern.bwt_char(step_rows)
                nxt = kern.lf(step_rows, c)
                rows = jnp.where(unresolved, nxt, rows)
                tidx = jnp.where(unresolved, try_offset(rows), tidx)
                return rows, tidx, it + 1

            def unrolled(state):
                for _ in range(4):
                    state = walk(state)
                return state

            tidx = try_offset(rows)
            rows, tidx, _ = jax.lax.while_loop(
                cond, unrolled, (rows, tidx, jnp.int32(0)))
            return tidx

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(P("fm", None), P(), P("fm", None), P("fm"), P(), P(),
                      P("dp")),
            out_specs=P("dp"),
            check_vma=False,
        )
        return mapped(*dev, rows)

    resolve.wide = sh.wide
    return resolve


class ShardedSearchEngine:
    """Drop-in BatchSearchEngine replacement running on a (dp, fm) mesh.

    Exposes the same pack/search/search_async/search_collect/
    search_first_hits surface, so TPUClassificationPipeline runs the FULL
    classification (search + extension fixpoint + native assignment tail
    + selection + report) over the mesh unchanged.

    Carries the single-chip engine's transport/loop optimizations (they
    are borrowed methods, not re-implementations, so the two engines
    cannot drift): transport-packed reads, per-lane packed code words in
    the step, lockstep survivor compaction, and the dense hit-pool
    output packing -- each applied per dp shard.
    """

    FIRST_MAX_HITS = 16
    FIRST_HITS_CHUNK = 4096

    def __init__(self, sh: ShardedFMArrays, mesh: Mesh,
                 min_hitlen: int = 22):
        self.sh = sh
        self.fm = sh            # shared helpers below read .fm.* fields
        self.mesh = mesh
        self.min_hitlen = min_hitlen
        self.n_dp = mesh.shape["dp"]
        self._search = make_sharded_search(mesh, sh, min_hitlen)
        self.lane_bucket_lo = max(256, self.n_dp)
        self.lmax_lo = 32
        self.pool_min_lanes = 1024      # per dp shard
        self.segment_min_lanes = 4096   # per dp shard
        self.stats = {"upload_bytes": 0, "download_bytes": 0,
                      "ext_searches": 0, "ext_lanes": 0}
        # serializes jax interactions for the tail-thread overlap (same
        # contract as BatchSearchEngine.dev_lock); the multi-host
        # subclass runs the serial stream regardless (the pipeline gates
        # the overlap on sync is None -- SPMD collectives must not be
        # issued from two threads of one process)
        import threading
        self.dev_lock = threading.RLock()

    # ---- borrowed single-chip helpers (identical semantics; the fm
    # geometry fields they read exist on ShardedFMArrays) ----
    from ..classify.engine import BatchSearchEngine as _B
    pack = _B.pack
    transport = staticmethod(_B.transport)
    pack_transport = _B.pack_transport
    pack_transport2 = _B.pack_transport2
    _compact_ok = _B._compact_ok
    _segments = _B._segments
    del _B

    def _unpack(self, packed: np.ndarray, nlanes: int, mh: int,
                compact: int):
        if compact in (3, 4, 5, 6):
            # one [pool | (nibbles) | tail] chunk per dp shard,
            # concatenated: unpack each shard at its own budget
            per = nlanes // self.n_dp
            clen = packed.shape[0] // self.n_dp
            parts = [
                _unpack_pool_outputs(packed[i * clen: (i + 1) * clen],
                                     per, mh, POOL_SLOTS_PER_LANE * per,
                                     mode=compact)
                for i in range(self.n_dp)]
            if len(parts) == 1:
                return parts[0]
            return [np.concatenate([p[k] for p in parts])
                    for k in range(6)]
        return _unpack_search_outputs(packed, mh, compact)

    def _run(self, rseqp, lengths, start, max_hits, first_hit_only,
             pool: bool = False, tmode: int = 1, segs: tuple = ()):
        nlanes = rseqp.shape[0]
        per = nlanes // self.n_dp
        plen = rseqp.shape[1] * (2 if tmode == 1 else
                                 4 if tmode == 2 else 1)
        compact = self._compact_ok(plen, max_hits,
                                   pool=pool and per >= self.pool_min_lanes)
        self.stats["upload_bytes"] += rseqp.nbytes + lengths.nbytes
        with self.dev_lock:
            packed = np.asarray(self._search(
                jnp.asarray(rseqp), jnp.asarray(lengths),
                jnp.asarray(start),
                max_hits=max_hits, first_hit_only=first_hit_only,
                compact=compact, packed_input=tmode, segments=segs))
        self.stats["download_bytes"] += packed.nbytes
        return self._unpack(packed, nlanes, max_hits, compact)

    def search_async(self, seqs, presolve: bool = False, khits: int = 5,
                     ihits: int = 200):
        L = len(seqs)
        maxlen = max((len(s) for s in seqs), default=1)
        lmax = _bucket_len(maxlen, lo=self.lmax_lo)
        nlanes = _bucket(L, lo=max(self.lane_bucket_lo, self.n_dp))
        rseqp, lengths, tmode = self.pack_transport2(seqs, lmax, nlanes)
        start = np.zeros(nlanes, dtype=np.int32)
        mh = min(self.FIRST_MAX_HITS, lmax)
        per = nlanes // self.n_dp
        segs = self._segments(per, maxlen)
        compact = self._compact_ok(lmax + self.sh.ftab_chars, mh,
                                   pool=per >= self.pool_min_lanes)
        with self.dev_lock:
            packed = self._search(
                jnp.asarray(rseqp), jnp.asarray(lengths),
                jnp.asarray(start),
                max_hits=mh, first_hit_only=False, compact=compact,
                packed_input=tmode, segments=segs)
            _start_host_copy(packed)
        self.stats["upload_bytes"] += rseqp.nbytes + lengths.nbytes
        return (packed, rseqp, lengths, mh, lmax, nlanes, compact, tmode)

    def search_fetch(self, handle):
        """Device-transfer block only (idempotent); see the single-chip
        engine's contract -- the overlap pipeline fetches on the main
        thread and unpacks in the tail worker."""
        packed, rseqp, lengths, mh, lmax, nlanes, compact, tmode = handle
        if isinstance(packed, np.ndarray):
            return handle
        with self.dev_lock:
            packed = np.asarray(packed)
        return (packed, rseqp, lengths, mh, lmax, nlanes, compact, tmode)

    def search_collect(self, handle, L: int):
        (packed, rseqp, lengths, mh, lmax, nlanes, compact,
         tmode) = self.search_fetch(handle)
        self.stats["download_bytes"] += packed.nbytes
        out = self._unpack(packed, nlanes, mh, compact)
        out = self._handle_overflow(out, rseqp, lengths, mh, lmax, nlanes,
                                    tmode)
        return [a[:L] for a in out], None

    def search(self, seqs):
        arrays, _ = self.search_collect(self.search_async(seqs), len(seqs))
        return arrays

    def _handle_overflow(self, out, rseqp, lengths, mh, lmax, nlanes,
                         tmode: int = 1):
        over = np.nonzero(out[4] > mh)[0]
        if over.shape[0]:
            nover = _bucket(over.shape[0], lo=max(32, self.n_dp))
            mh2 = min(_bucket(int(out[4].max()), lo=2 * mh), lmax)
            rseq2 = np.zeros((nover, rseqp.shape[1]), dtype=rseqp.dtype)
            rseq2[: over.shape[0]] = rseqp[over]
            lengths2 = np.zeros(nover, dtype=np.int32)
            lengths2[: over.shape[0]] = lengths[over]
            full = self._run(rseq2, lengths2,
                             np.zeros(nover, dtype=np.int32), mh2, False,
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
            out = wide
        return out

    def search_first_hits(self, seqs, offsets: np.ndarray):
        L = len(seqs)
        lmax = _bucket_len(max((len(s) for s in seqs), default=1),
                           lo=self.lmax_lo)
        chunk = self.FIRST_HITS_CHUNK
        self.stats["ext_searches"] += (L + chunk - 1) // chunk
        self.stats["ext_lanes"] += L
        outs = []
        for c0 in range(0, L, chunk):
            part = seqs[c0: c0 + chunk]
            rseqp, lengths, tmode = self.pack_transport2(part, lmax, chunk)
            start = np.zeros(chunk, dtype=np.int32)
            start[: len(part)] = offsets[c0: c0 + chunk].astype(np.int32)
            out = self._run(rseqp, lengths, start, 1, True, tmode=tmode)
            outs.append([a[: len(part)] for a in out])
        if len(outs) == 1:
            return outs[0]
        return [np.concatenate([o[k] for o in outs]) for k in range(6)]


def make_mesh(n_dp: int, n_fm: int, devices=None) -> Mesh:
    """Build a 2-D (dp, fm) mesh over the given (or all) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_dp * n_fm, (devices.size, n_dp, n_fm)
    return Mesh(devices[: n_dp * n_fm].reshape(n_dp, n_fm), ("dp", "fm"))


def pad_lanes(rseq: np.ndarray, lengths: np.ndarray, start: np.ndarray,
              n_dp: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad the lane dimension to a multiple of the dp axis (dead lanes
    have length 0 and finish immediately)."""
    return (_pad_to(rseq, n_dp), _pad_to(lengths, n_dp), _pad_to(start, n_dp))
