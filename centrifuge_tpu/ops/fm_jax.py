"""JAX device FM-index: batched rank/LF/ftab/resolve over a repacked BWT.

TPU-first layout: the BWT is repacked into fixed blocks of 512 bases;
each block row holds 4 occ checkpoints followed by 32 uint32 words
(16 bases/word, little-endian 2-bit). One rank query = one row gather
(144B) + vectorized 2-bit popcount, so a batched LF step for B lanes is
two (B, 36) gathers and pure VPU math -- bandwidth-bound, which is the
hardware ceiling for FM search.

Counting trick: XOR the word with the char's repeated 2-bit pattern;
bases equal to c become 00; AND the two bit-planes of the complement to
get one marker bit per base; population_count finishes the job. This is
the vector analog of the reference's countInU64 (bt2_idx.h:505-517).

Row indexes are int32 for indexes under 2^31 bases. Larger indexes (the
p_compressed/nt scale) use the WIDE path: row values are int64 (requires
jax x64), and each block row carries 64-bit occ checkpoints split into
lo/hi uint32 pairs (occ_lo[4] | occ_hi[4] | words[32]) so a rank query
is still one gather.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.cf_io import CFIndex

BLOCK_BASES = 512
WORDS_PER_BLOCK = BLOCK_BASES // 16
ROW_I32 = 4 + WORDS_PER_BLOCK  # occ[4] + words[32]

# char -> repeated 2-bit pattern (uint32)
_CHAR_PATTERNS = np.array(
    [0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF], dtype=np.uint32)


@dataclass
class DeviceFMIndex:
    """Device-resident arrays for the FM search kernels."""

    blocks: jax.Array      # uint32[nblk, 36|40]: occ then 32 bwt words
    fchr: jax.Array        # int32/int64[5]
    ftab_top: jax.Array    # int32/int64[4^ftabChars]
    ftab_bot: jax.Array    # int32/int64[4^ftabChars]
    ftab_tb: jax.Array     # [4^ftabChars, 2] stacked (top, bot):
                           # one gather yields both range ends
    offs: jax.Array        # int32[offsLen] SA-sample sequence indexes
    boundary_rows: jax.Array    # row-dtype[nb] sorted
    boundary_refs: jax.Array    # int32[nb]
    zoff: int
    bwt_len: int
    ftab_chars: int
    offrate: int
    npat: int
    wide: bool = False     # True: int64 rows, 64-bit occ checkpoints

    @property
    def row_dtype(self):
        return jnp.int64 if self.wide else jnp.int32

    @property
    def word_off(self) -> int:
        return 8 if self.wide else 4

    @staticmethod
    def build(idx: CFIndex, device=None, wide: bool = None) -> "DeviceFMIndex":
        if wide is None:
            wide = idx.bwt_len >= (1 << 31)
        if wide and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "index >= 2^31 bases needs the wide path: enable 64-bit "
                "mode first (jax.config.update('jax_enable_x64', True))")
        bwt = idx.bwt
        n = bwt.shape[0]
        nblk = n // BLOCK_BASES + 1
        padded = np.zeros(nblk * BLOCK_BASES, dtype=np.uint8)
        padded[:n] = bwt
        # pack 16 bases/word
        b = padded.reshape(-1, 16).astype(np.uint32)
        words = np.zeros(b.shape[0], dtype=np.uint32)
        for i in range(16):
            words |= b[:, i] << (2 * i)
        words = words.reshape(nblk, WORDS_PER_BLOCK)
        # occ checkpoints: raw counts before each block ('$' counted as the
        # code-0 'A' it is stored as; the rank kernel subtracts it once)
        blocks_codes = padded.reshape(nblk, BLOCK_BASES)
        occ = np.zeros((nblk, 4), dtype=np.uint64)
        for c in range(4):
            cnt = (blocks_codes == c).sum(axis=1).astype(np.uint64)
            occ[1:, c] = np.cumsum(cnt)[:-1]
        if wide:
            occ_lo = (occ & 0xFFFFFFFF).astype(np.uint32)
            occ_hi = (occ >> 32).astype(np.uint32)
            rows = np.concatenate([occ_lo, occ_hi, words], axis=1)
        else:
            rows = np.concatenate([occ.astype(np.uint32), words], axis=1)

        put = functools.partial(jax.device_put, device=device)
        it = np.int64 if wide else np.int32
        ftab_tb = np.stack([idx.ftab_top.astype(it),
                            idx.ftab_bot.astype(it)], axis=1)
        return DeviceFMIndex(
            blocks=put(rows),
            fchr=put(idx.fchr.astype(it)),
            ftab_top=put(idx.ftab_top.astype(it)),
            ftab_bot=put(idx.ftab_bot.astype(it)),
            ftab_tb=put(ftab_tb),
            offs=put(idx.offs.astype(np.int32)),
            boundary_rows=put(idx.boundary_rows.astype(it)),
            boundary_refs=put(idx.boundary_refidx.astype(np.int32)),
            zoff=int(idx.zoff),
            bwt_len=int(idx.bwt_len),
            ftab_chars=int(idx.ftab_chars),
            offrate=int(idx.offrate),
            npat=int(idx.npat),
            wide=wide,
        )


def _count_c_in_word(word: jax.Array, pattern: jax.Array, nvalid: jax.Array) -> jax.Array:
    """Count char-matches among the first `nvalid` bases of each word."""
    x = word ^ pattern
    y = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    # clip the shift to stay < 32 (shift-by-32 is undefined); the >=16 case
    # selects the full mask anyway
    shift = (2 * jnp.clip(nvalid, 0, 15)).astype(jnp.uint32)
    mask = jnp.where(nvalid >= 16, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << shift) - 1)
    return jax.lax.population_count(y & mask).astype(jnp.int32)


def rank_in_block(data: jax.Array, within: jax.Array, chars: jax.Array,
                  zoff, rows: jax.Array, word_off: int = 4) -> jax.Array:
    """rank_c(row) given the gathered block rows `data` (B, 36|40).

    `within` = row & 511. Shared by the replicated-index path (rank_kernel)
    and the BWT-range-sharded path (parallel/sharded.py), which gathers
    `data` from its local block slice before calling this. word_off=8
    selects the wide layout (64-bit occ split into lo/hi uint32 pairs);
    the result dtype then widens to int64.
    """
    words = data[:, word_off:]               # (B, 32)
    pattern = jnp.asarray(_CHAR_PATTERNS)[chars][:, None]     # (B, 1)
    widx = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)[None, :]
    within32 = within.astype(jnp.int32)
    nvalid = jnp.clip(within32[:, None] - widx * 16, 0, 16)
    cnt = _count_c_in_word(words, pattern, nvalid).sum(axis=1, dtype=jnp.int32)
    lanes = jnp.arange(rows.shape[0])
    if word_off == 8:
        lo = data[lanes, chars].astype(jnp.int64)
        hi = data[lanes, chars + 4].astype(jnp.int64)
        base = lo | (hi << 32)
    else:
        base = data[lanes, chars].astype(jnp.int32)
    adj = ((chars == 0) & (zoff < rows)).astype(jnp.int32)
    return base + cnt - adj


def _layout_word_off(blocks) -> int:
    return 8 if blocks.shape[1] == 8 + WORDS_PER_BLOCK else 4


def rank_kernel(blocks: jax.Array, zoff, rows: jax.Array,
                chars: jax.Array) -> jax.Array:
    """Batched rank_c(row): occurrences of c in bwt[0:row], $ excluded."""
    blk = rows >> 9
    within = rows & 511
    data = blocks[blk]
    return rank_in_block(data, within, chars, zoff, rows,
                         _layout_word_off(blocks))


def lf_kernel(blocks, fchr, zoff, rows, chars):
    """Batched LF(row, c) = fchr[c] + rank_c(row)."""
    return fchr[chars] + rank_kernel(blocks, zoff, rows, chars)


def bwt_char_kernel(blocks: jax.Array, rows: jax.Array) -> jax.Array:
    """Batched BWT[row] (the '$' row reads as code 0, as stored)."""
    blk = rows >> 9
    within = (rows & 511).astype(jnp.int32)
    data = blocks[blk]
    word = data[jnp.arange(rows.shape[0]),
                _layout_word_off(blocks) + (within >> 4)]
    return ((word >> (2 * (within & 15).astype(jnp.uint32))) & 3).astype(jnp.int32)


def lf_step_with_char(blocks, fchr, zoff, rows):
    """One left-walk step: LF(row, BWT[row]); used by SA resolution."""
    c = bwt_char_kernel(blocks, rows)
    return lf_kernel(blocks, fchr, zoff, rows, c)


@functools.partial(jax.jit, static_argnames=("sample_mask", "offrate",
                                             "has_bounds", "narrow",
                                             "max_steps"))
def _resolve_rows(blocks, fchr, offs, boundary_rows, boundary_refs, zoff,
                  rows, sample_mask: int, offrate: int, has_bounds: bool,
                  narrow: bool, max_steps: int):
    """Jitted SA-row -> tidx walk; module-level so the compile is cached
    across pipeline instances (keyed by array shapes + static config)."""

    def try_offset(rows):
        tidx = jnp.full(rows.shape, -1, jnp.int32)
        sampled = (rows & sample_mask) == 0
        sval = offs[jnp.clip(rows >> offrate, 0, offs.shape[0] - 1)]
        tidx = jnp.where(sampled, sval, tidx)
        if has_bounds:
            pos = jnp.searchsorted(boundary_rows, rows)
            posc = jnp.clip(pos, 0, boundary_rows.shape[0] - 1)
            is_b = (boundary_rows[posc] == rows) & ~sampled
            bval = boundary_refs[posc]
            if narrow:
                bval = bval & 0xFFFF
            # the check is gated on a nonzero max boundary row
            # (bt2_idx.h:2001-2010)
            last = boundary_rows[-1]
            is_b = is_b & (last > 0) & (rows <= last)
            tidx = jnp.where(is_b, bval, tidx)
        tidx = jnp.where(rows == zoff, 0, tidx)
        return tidx

    def cond(state):
        rows, tidx, it = state
        return (tidx < 0).any() & (it < max_steps)

    def step(state):
        rows, tidx, it = state
        unresolved = tidx < 0
        step_rows = jnp.where(unresolved, rows, 0)
        nxt = lf_step_with_char(blocks, fchr, zoff, step_rows)
        rows = jnp.where(unresolved, nxt, rows)
        t2 = try_offset(rows)
        tidx = jnp.where(unresolved, t2, tidx)
        return rows, tidx, it + 1

    def body(state):
        # the step is a no-op on resolved rows, so unrolling amortizes
        # per-iteration dispatch overhead without changing results
        for _ in range(4):
            state = step(state)
        return state

    tidx = try_offset(rows)
    rows, tidx, _ = jax.lax.while_loop(cond, body, (rows, tidx, jnp.int32(0)))
    return tidx


def make_resolver(fm: DeviceFMIndex, max_steps: int = 4096):
    """Batched SA-row -> sequence-index resolver.

    Walks LF until each row hits the '$' row, a sampled row, or a
    genome-boundary row (tryOffset, bt2_idx.h:1980-2014 + the GroupWalk
    walk). Returns a fn rows int32[M] -> tidx int32[M].
    """
    sample_mask = (1 << fm.offrate) - 1
    has_bounds = fm.boundary_rows.shape[0] > 0
    narrow = fm.npat <= 0xFFFF

    def resolve(rows):
        return _resolve_rows(
            fm.blocks, fm.fchr, fm.offs, fm.boundary_rows, fm.boundary_refs,
            jnp.asarray(fm.zoff, fm.row_dtype), rows,
            sample_mask=sample_mask, offrate=fm.offrate,
            has_bounds=has_bounds, narrow=narrow, max_steps=max_steps)

    resolve.wide = fm.wide
    return resolve
