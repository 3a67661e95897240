"""Multi-chip execution: data-parallel reads x BWT-range-sharded index.

The reference scales with pthreads over reads sharing one read-only index
(centrifuge.cpp:2806-2814); it has no distributed backend. The TPU-native
design generalizes both axes onto a 2-D `jax.sharding.Mesh`:

  * axis "dp": reads (lanes) are sharded -- pure data parallelism; each
    device runs the lockstep search loop on its lane slice.
  * axis "fm": the packed BWT block table, the ftab, and the SA sample are
    sharded by row range -- the analog of tensor parallelism, needed when
    the index exceeds one chip's HBM (nt-scale, >64 GB). Every rank query
    is answered by the shard owning that BWT row: each member computes a
    masked partial count and a `psum` over "fm" reconstitutes the full
    value on all members (collectives ride ICI).

All devices in one "fm" group hold identical lane state, so the
`lax.while_loop` trip counts agree and the psum inside the loop body is
uniform; different "dp" rows run fully independent loops.

Host-side merge of per-shard metrics mirrors the reference's mutex merge
(centrifuge.cpp:2752) as a psum epilogue.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..index.cf_io import CFIndex
from ..ops.fm_jax import (BLOCK_BASES, ROW_I32, WORDS_PER_BLOCK,
                          rank_in_block)
from ..classify.engine import FMKernels, search_loop


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

    blocks: np.ndarray      # uint32[nblk_pad, 36]
    fchr: np.ndarray        # int32[5] (replicated)
    ftab_tb: np.ndarray     # int32[4^fc, 2] stacked (top, bot)
    offs: np.ndarray        # int32[offs_pad]
    boundary_rows: np.ndarray   # int32[nb] (replicated; tiny)
    boundary_refs: np.ndarray   # int32[nb]
    zoff: int
    bwt_len: int
    offrate: int
    npat: int
    n_fm: int

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
    def build(idx: CFIndex, n_fm: int) -> "ShardedFMArrays":
        if idx.bwt_len >= (1 << 31):
            raise NotImplementedError("indexes >= 2^31 bases need the wide path")
        bwt = idx.bwt
        n = bwt.shape[0]
        nblk = n // BLOCK_BASES + 1
        padded = np.zeros(nblk * BLOCK_BASES, dtype=np.uint8)
        padded[:n] = bwt
        b = padded.reshape(-1, 16).astype(np.uint32)
        words = np.zeros(b.shape[0], dtype=np.uint32)
        for i in range(16):
            words |= b[:, i] << (2 * i)
        words = words.reshape(nblk, WORDS_PER_BLOCK)
        blocks_codes = padded.reshape(nblk, BLOCK_BASES)
        occ = np.zeros((nblk, 4), dtype=np.uint32)
        for c in range(4):
            cnt = (blocks_codes == c).sum(axis=1).astype(np.uint64)
            occ[1:, c] = np.cumsum(cnt)[:-1]
        rows = np.concatenate([occ, words], axis=1)

        if (1 << (2 * idx.ftab_chars)) % n_fm != 0:
            raise ValueError("ftab size must divide the fm axis")
        return ShardedFMArrays(
            blocks=_pad_to(rows, n_fm),
            fchr=idx.fchr.astype(np.int32),
            ftab_tb=np.stack([idx.ftab_top.astype(np.int32),
                              idx.ftab_bot.astype(np.int32)], axis=1),
            offs=_pad_to(idx.offs.astype(np.int32), n_fm),
            boundary_rows=idx.boundary_rows.astype(np.int32),
            boundary_refs=idx.boundary_refidx.astype(np.int32),
            zoff=int(idx.zoff),
            bwt_len=int(idx.bwt_len),
            offrate=int(idx.offrate),
            npat=int(idx.npat),
            n_fm=n_fm,
        )


def _shard_kernels(blocks_l, fchr, ftab_tb_l, zoff,
                   nblk_per, nftab_per, num_ftab, axis: str) -> FMKernels:
    """FMKernels over a local BWT-range slice: masked gather + psum."""
    fm_idx = jax.lax.axis_index(axis)
    blk_base = (fm_idx * nblk_per).astype(jnp.int32)
    ftab_base = (fm_idx * nftab_per).astype(jnp.int32)

    def rank(rows, chars):
        blk = (rows >> 9) - blk_base
        valid = (blk >= 0) & (blk < nblk_per)
        data = blocks_l[jnp.clip(blk, 0, nblk_per - 1)]
        r = rank_in_block(data, rows & 511, chars, zoff, rows)
        return jax.lax.psum(jnp.where(valid, r, 0), axis)

    def lf(rows, chars):
        return fchr[chars] + rank(rows, chars)

    def bwt_char(rows):
        blk = (rows >> 9) - blk_base
        valid = (blk >= 0) & (blk < nblk_per)
        data = blocks_l[jnp.clip(blk, 0, nblk_per - 1)]
        within = rows & 511
        word = data[jnp.arange(rows.shape[0]), 4 + (within >> 4)]
        ch = ((word >> (2 * (within & 15).astype(jnp.uint32))) & 3).astype(jnp.int32)
        return jax.lax.psum(jnp.where(valid, ch, 0), axis)

    def lf_pair(rows_t, rows_b, chars):
        B = rows_t.shape[0]
        rows = jnp.concatenate([rows_t, rows_b])
        ch2 = jnp.concatenate([chars, chars])
        blk = (rows >> 9) - blk_base
        valid = (blk >= 0) & (blk < nblk_per)
        data = blocks_l[jnp.clip(blk, 0, nblk_per - 1)]
        within = rows & 511
        r = rank_in_block(data, within, ch2, zoff, rows)
        r = jax.lax.psum(jnp.where(valid, r, 0), axis)
        lf2 = fchr[ch2] + r
        word = data[jnp.arange(2 * B), 4 + (within >> 4)]
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

    return FMKernels(ftab_lookup=ftab_lookup, lf_pair=lf_pair, lf=lf,
                     bwt_char=bwt_char, zoff=zoff, num_ftab=num_ftab)


def make_sharded_step(mesh: Mesh, sh: ShardedFMArrays,
                      min_hitlen: int = 22, max_hits: int = 8,
                      resolve_steps: int = 4096):
    """Build the jitted multi-chip classification device step.

    The step = full greedy search for every lane + SA resolution of each
    recorded hit's `top` row + a psum'd per-shard read counter (the metrics
    merge). Lanes are sharded over "dp"; the index over "fm".

    Returns fn(rseq, lengths, start) ->
        (h_top, h_bot, h_off, h_len, nhits, sums, tidx, reads_done)
    with lane-major outputs gathered to global arrays.
    """
    increment = 10 if 2 * min_hitlen <= 33 else 2 * min_hitlen - 33
    num_ftab = sh.ftab_tb.shape[0]
    nblk_per = sh.nblk_per
    nftab_per = sh.nftab_per
    noffs_per = sh.noffs_per
    zoff = jnp.int32(sh.zoff)
    offrate = sh.offrate
    sample_mask = (1 << offrate) - 1
    narrow = sh.npat <= 0xFFFF
    has_bounds = sh.boundary_rows.shape[0] > 0

    def body(blocks_l, fchr, ftab_tb_l, offs_l, brows, brefs,
             rseq, lengths, start):
        kern = _shard_kernels(blocks_l, fchr, ftab_tb_l, zoff,
                              nblk_per, nftab_per, num_ftab, "fm")
        h_top, h_bot, h_off, h_len, nhits, sums = search_loop(
            kern, rseq, lengths, start, min_hitlen, increment, max_hits,
            first_hit_only=False)

        # --- batched SA resolution of every hit top row ---
        fm_idx = jax.lax.axis_index("fm")
        offs_base = (fm_idx * noffs_per).astype(jnp.int32)

        def try_offset(rows):
            tidx = jnp.full_like(rows, -1)
            sampled = (rows & sample_mask) == 0
            li = (rows >> offrate) - offs_base
            lvalid = (li >= 0) & (li < noffs_per)
            sval = jnp.where(lvalid,
                             offs_l[jnp.clip(li, 0, noffs_per - 1)], 0)
            sval = jax.lax.psum(sval, "fm")
            tidx = jnp.where(sampled, sval, tidx)
            if has_bounds:
                pos = jnp.searchsorted(brows, rows)
                posc = jnp.clip(pos, 0, brows.shape[0] - 1)
                is_b = (brows[posc] == rows) & ~sampled
                bval = brefs[posc]
                if narrow:
                    bval = bval & 0xFFFF
                last = brows[-1]
                is_b = is_b & (last > 0) & (rows <= last)
                tidx = jnp.where(is_b, bval, tidx)
            return jnp.where(rows == zoff, 0, tidx)

        L = rseq.shape[0]
        rows0 = jnp.clip(h_top.reshape(-1), 0, sh.bwt_len - 1)
        live = (h_top.reshape(-1) >= 0)

        def rcond(state):
            rows, tidx, it = state
            return ((tidx < 0) & live).any() & (it < resolve_steps)

        def rbody(state):
            rows, tidx, it = state
            unresolved = (tidx < 0) & live
            step_rows = jnp.where(unresolved, rows, 0)
            c = kern.bwt_char(step_rows)
            nxt = kern.lf(step_rows, c)
            rows = jnp.where(unresolved, nxt, rows)
            tidx = jnp.where(unresolved, try_offset(rows), tidx)
            return rows, tidx, it + 1

        tidx0 = jnp.where(live, try_offset(rows0), -2)
        _, tidx, _ = jax.lax.while_loop(
            rcond, rbody, (rows0, tidx0, jnp.int32(0)))
        tidx = tidx.reshape(L, max_hits)

        # --- metrics merge: reads finished on this dp shard, summed over dp
        reads_done = jax.lax.psum(
            jnp.sum((lengths > 0).astype(jnp.int32)), "dp")
        return h_top, h_bot, h_off, h_len, nhits, sums, tidx, reads_done

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P("fm", None), P(), P("fm", None), P("fm"), P(), P(),
                  P("dp", None), P("dp"), P("dp")),
        out_specs=(P("dp", None), P("dp", None), P("dp", None),
                   P("dp", None), P("dp"), P("dp"), P("dp", None), P()),
        check_rep=False,
    )

    sharding = lambda *spec: NamedSharding(mesh, P(*spec))
    dev_arrays = (
        jax.device_put(sh.blocks, sharding("fm", None)),
        jax.device_put(sh.fchr, sharding()),
        jax.device_put(sh.ftab_tb, sharding("fm", None)),
        jax.device_put(sh.offs, sharding("fm")),
        jax.device_put(sh.boundary_rows, sharding()),
        jax.device_put(sh.boundary_refs, sharding()),
    )

    @jax.jit
    def step(rseq, lengths, start):
        return mapped(*dev_arrays, rseq, lengths, start)

    return step


def pad_lanes(rseq: np.ndarray, lengths: np.ndarray, start: np.ndarray,
              n_dp: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad the lane dimension to a multiple of the dp axis (dead lanes
    have length 0 and finish immediately)."""
    return (_pad_to(rseq, n_dp), _pad_to(lengths, n_dp), _pad_to(start, n_dp))
