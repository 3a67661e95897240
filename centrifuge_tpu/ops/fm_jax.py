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
import os
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


def _char_pattern(chars: jax.Array) -> jax.Array:
    """The repeated 2-bit pattern for each char WITHOUT a table gather:
    the four patterns are exactly c * 0x55555555 (mod 2^32), and scalar
    gathers cost 5-16 ns/elem on this backend vs ~free arithmetic."""
    return chars.astype(jnp.uint32) * jnp.uint32(0x55555555)


def _fchr_select(fchr: jax.Array, chars: jax.Array) -> jax.Array:
    """fchr[chars] for chars in [0, 3] via a 4-wide masked sum instead of
    a scalar gather (the gather costs ~8 ns per element; this fuses into
    the surrounding elementwise graph)."""
    idx = jnp.arange(4, dtype=jnp.int32)[None, :]
    return jnp.where(idx == chars[:, None], fchr[None, :4], 0).sum(
        axis=1, dtype=fchr.dtype)


def pack_ftab_rows(top_arr: np.ndarray, bot_arr: np.ndarray, wide: bool,
                   width: int) -> np.ndarray:
    """Pack (top, bot) ftab entries into block-shaped uint32 rows so the
    fused one-row step can gather a start lane's ftab entry from the
    same unified table as the BWT blocks (fused_step_lookup1). Layout:
    narrow = 16 (top, bot) pairs per row; wide = 8 entries x 4 words
    (top_lo, top_hi, bot_lo, bot_hi)."""
    ne = top_arr.shape[0]
    if wide:
        per = 8
        nfr = (ne + per - 1) // per
        fr = np.zeros((nfr, width), dtype=np.uint32)
        quads = np.zeros((nfr * per, 4), dtype=np.uint32)
        t64 = top_arr.astype(np.uint64)
        b64 = bot_arr.astype(np.uint64)
        quads[:ne, 0] = (t64 & 0xFFFFFFFF).astype(np.uint32)
        quads[:ne, 1] = (t64 >> 32).astype(np.uint32)
        quads[:ne, 2] = (b64 & 0xFFFFFFFF).astype(np.uint32)
        quads[:ne, 3] = (b64 >> 32).astype(np.uint32)
        fr[:, : per * 4] = quads.reshape(nfr, per * 4)
    else:
        per = 16
        nfr = (ne + per - 1) // per
        fr = np.zeros((nfr, width), dtype=np.uint32)
        pairs = np.zeros((nfr * per, 2), dtype=np.uint32)
        pairs[:ne, 0] = top_arr.astype(np.uint32)
        pairs[:ne, 1] = bot_arr.astype(np.uint32)
        fr[:, : per * 2] = pairs.reshape(nfr, per * 2)
    return fr


def pack_bwt_blocks(bwt: np.ndarray, wide: bool) -> np.ndarray:
    """Repack a BWT code array into 512-base device block rows.

    Narrow: uint32[nblk, 4 + 32] = occ[4] | words[32].
    Wide:   uint32[nblk, 8 + 32] = occ_lo[4] | occ_hi[4] | words[32]
    (64-bit occ checkpoints split into lo/hi pairs so a rank query stays
    one gather). Occ counts are GLOBAL prefix counts, so a row-range
    slice of the result is directly usable by the BWT-range-sharded
    path. '$' is counted as the code-0 'A' it is stored as; the rank
    kernel subtracts it once."""
    n = bwt.shape[0]
    nblk = n // BLOCK_BASES + 1
    word_off = 8 if wide else 4
    out = np.zeros((nblk, word_off + WORDS_PER_BLOCK), dtype=np.uint32)
    # chunked over block ranges: the obvious one-shot uint32 cast of the
    # whole text costs 4 B/base of transient RAM (~48 GB at 12 Gbp);
    # per-chunk peak is a few hundred MB instead
    chunk_blk = 1 << 20                      # 512 Mbases per chunk
    run = np.zeros(4, dtype=np.uint64)       # occ at chunk start
    for b0 in range(0, nblk, chunk_blk):
        b1 = min(nblk, b0 + chunk_blk)
        lo = b0 * BLOCK_BASES
        hi = min(n, b1 * BLOCK_BASES)
        codes = np.zeros((b1 - b0) * BLOCK_BASES, dtype=np.uint8)
        if hi > lo:
            codes[: hi - lo] = bwt[lo:hi]
        q = codes.reshape(-1, 16).astype(np.uint32)
        words = np.zeros(q.shape[0], dtype=np.uint32)
        for i in range(16):
            words |= q[:, i] << (2 * i)
        out[b0:b1, word_off:] = words.reshape(b1 - b0, WORDS_PER_BLOCK)
        blocks_codes = codes.reshape(b1 - b0, BLOCK_BASES)
        occ = np.zeros((b1 - b0, 4), dtype=np.uint64)
        for c in range(4):
            cnt = (blocks_codes == c).sum(axis=1).astype(np.uint64)
            occ[1:, c] = np.cumsum(cnt)[:-1]
            occ[:, c] += run[c]
            run[c] += cnt.sum()
        if wide:
            out[b0:b1, :4] = (occ & 0xFFFFFFFF).astype(np.uint32)
            out[b0:b1, 4:8] = (occ >> 32).astype(np.uint32)
        else:
            out[b0:b1, :4] = occ.astype(np.uint32)
    return out


@dataclass
class DeviceFMIndex:
    """Device-resident arrays for the FM search kernels."""

    blocks: jax.Array      # uint32[nblk, 36|40]: occ then 32 bwt words
    ufm: jax.Array         # uint32[nblk + nftab_rows, 36|40]: the blocks
                           # table with the ftab packed into trailing rows,
                           # so one gather serves both the LF rank lookup
                           # (extending lanes) and the ftab range lookup
                           # (starting lanes). Row layout of the ftab
                           # region: narrow = 16 (top, bot) int32 pairs per
                           # row; wide = 8 (top_lo, top_hi, bot_lo, bot_hi)
                           # quads per row.
    nblk: int              # ftab region starts at ufm[nblk]
    fchr: jax.Array        # int32/int64[5]
    ftab_top: jax.Array    # int32/int64[4^ftabChars]
    ftab_bot: jax.Array    # int32/int64[4^ftabChars]
    ftab_tb: jax.Array     # [4^ftabChars, 2] stacked (top, bot):
                           # one gather yields both range ends
    offs: jax.Array        # int32[ceil(offsLen/8), 8] SA-sample seq
                           # indexes packed 8/row (see _pack_offs8)
    boundary_rows: jax.Array    # row-dtype[nb] sorted
    boundary_refs: jax.Array    # int32[nb]
    zoff: int
    bwt_len: int
    ftab_chars: int
    offrate: int
    npat: int
    wide: bool = False     # True: int64 rows, 64-bit occ checkpoints
    host_blocks: object = None  # np.ndarray when built with
                                # keep_host_blocks=True: the host copy of
                                # the packed block rows, shared with the
                                # native host resolver (native/fmwalk.py)
    nblk12: int = 0        # ufm row offset of the depth-12 ftab region
                           # (0 = not built). Large indexes deepen the
                           # prime 10 -> 12 chars at load by LF-extending
                           # every ftab entry with the 16 2-char suffixes
                           # (native/fmwalk.fm_ftab_extend) -- two fewer
                           # LF steps per successful search start, no .cf
                           # format change (ftab stays 10, the reference
                           # geometry bt2_idx.h:1930-1946).

    @property
    def row_dtype(self):
        return jnp.int64 if self.wide else jnp.int32

    @property
    def word_off(self) -> int:
        return 8 if self.wide else 4

    @staticmethod
    def build(idx: CFIndex, device=None, wide: bool = None,
              keep_host_blocks: bool = False,
              deep_ftab: bool = None) -> "DeviceFMIndex":
        if wide is None:
            wide = idx.bwt_len >= (1 << 31)
        if wide and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "index >= 2^31 bases needs the wide path: enable 64-bit "
                "mode first (jax.config.update('jax_enable_x64', True))")
        rows = pack_bwt_blocks(idx.bwt, wide)
        if deep_ftab is None:
            env = os.environ.get("CENTRIFUGE_TPU_DEEP_FTAB")
            if env is not None:
                # the env toggle overrides the SIZE heuristic only; the
                # extension itself is structurally depth-10 -> depth-12
                # (ftab_extend asserts 4^10 entries), so a non-standard
                # ftab_chars index must still skip it
                deep_ftab = (env.lower() not in ("0", "off", "false", "no")
                             and idx.ftab_chars == 10)
            else:
                # worth it when the expected depth-12 range is still >= ~2
                # occurrences (random-text model: bwt_len / 4^12): on small
                # indexes most 12-mers are absent and the failed deep prime
                # would cost one extra step per search start
                deep_ftab = (idx.ftab_chars == 10
                             and idx.bwt_len >= (1 << 25))
        ftab12 = None
        dev12 = False
        if deep_ftab:
            # Default: compute the depth-12 table ON DEVICE after the
            # unified-table upload (_ftab12_rows_graph) -- the 33.5M load
            # -time rank queries were the dominant index-load cost at 12
            # Gbp on the host. CENTRIFUGE_TPU_DEEP_FTAB_DEVICE=0 selects
            # the native host path (kept as the parity oracle).
            denv = os.environ.get("CENTRIFUGE_TPU_DEEP_FTAB_DEVICE", "1")
            dev12 = denv.lower() not in ("0", "off", "false", "no")
            if not dev12:
                # ftab_extend returns None itself when the native library
                # is absent; only an import failure lands here
                try:
                    from ..native.fmwalk import ftab_extend
                except ImportError:
                    ftab12 = None
                else:
                    ftab12 = ftab_extend(rows, idx, wide)

        put = functools.partial(jax.device_put, device=device)
        it = np.int64 if wide else np.int32
        ftab_tb = np.stack([idx.ftab_top.astype(it),
                            idx.ftab_bot.astype(it)], axis=1)

        # --- unified table: ftab entries packed into block-shaped rows ---
        width = rows.shape[1]
        frows = pack_ftab_rows(idx.ftab_top, idx.ftab_bot, wide, width)
        parts = [rows, frows]
        nblk12 = 0
        if ftab12 is not None or dev12:
            nblk12 = rows.shape[0] + frows.shape[0]
            if ftab12 is not None:
                parts.append(pack_ftab_rows(ftab12[0], ftab12[1], wide,
                                            width))
            else:
                # zero placeholder; filled in-place on device below
                parts.append(np.zeros(((1 << 24) // (8 if wide else 16),
                                       width), dtype=np.uint32))
        ufm = np.concatenate(parts, axis=0)

        # one device allocation serves both: row-indexed kernels only ever
        # touch rows < nblk, so `blocks` can alias the unified table
        ufm_dev = put(ufm)
        fchr_dev = put(idx.fchr.astype(it))
        if dev12:
            n10 = 1 << 20
            t0 = put(np.ascontiguousarray(idx.ftab_top[:n10], dtype=it))
            b0 = put(np.ascontiguousarray(idx.ftab_bot[:n10], dtype=it))
            fr12 = _ftab12_rows_graph(ufm_dev, fchr_dev, int(idx.zoff),
                                      t0, b0)
            ufm_dev = _ufm_write_rows(ufm_dev, fr12, int(nblk12))
        return DeviceFMIndex(
            blocks=ufm_dev,
            ufm=ufm_dev,
            nblk=int(rows.shape[0]),
            fchr=fchr_dev,
            ftab_top=put(idx.ftab_top.astype(it)),
            ftab_bot=put(idx.ftab_bot.astype(it)),
            ftab_tb=put(ftab_tb),
            offs=put(_pack_offs8(idx.offs)),
            boundary_rows=put(idx.boundary_rows.astype(it)),
            boundary_refs=put(idx.boundary_refidx.astype(np.int32)),
            zoff=int(idx.zoff),
            bwt_len=int(idx.bwt_len),
            ftab_chars=int(idx.ftab_chars),
            offrate=int(idx.offrate),
            npat=int(idx.npat),
            wide=wide,
            host_blocks=rows if keep_host_blocks else None,
            nblk12=nblk12,
        )


def _pack_offs8(offs: np.ndarray) -> np.ndarray:
    """SA-sample values padded + reshaped to (n/8, 8) so the resolver's
    per-step sample lookup is a row gather + fused select instead of a
    scalar gather (~5x cheaper per row on TPU)."""
    n = offs.shape[0]
    n8 = ((n + 7) // 8) * 8
    out = np.zeros(n8, np.int32)
    out[:n] = offs.astype(np.int32)
    return out.reshape(-1, 8)


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
    pattern = _char_pattern(chars)[:, None]                   # (B, 1)
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


def _select_col(data: jax.Array, col: jax.Array) -> jax.Array:
    """data[i, col[i]] without a scalar gather: masked sum (fuses into the
    surrounding elementwise graph; scalar gathers cost ~10x more than
    vector math on TPU). Keeps the input dtype (jnp.sum would promote
    32-bit ints to 64-bit under x64)."""
    ncol = data.shape[1]
    idx = jnp.arange(ncol, dtype=jnp.int32)[None, :]
    return jnp.where(idx == col[:, None], data, 0).sum(axis=1,
                                                       dtype=data.dtype)


def _rank_from_rows(data: jax.Array, within: jax.Array, chars: jax.Array,
                    zoff, rows: jax.Array, word_off: int) -> jax.Array:
    """rank_c(row) from pre-gathered rows, gather-free.

    Same math as rank_in_block but the occ-checkpoint base is extracted
    with a masked sum instead of a second scalar gather.
    """
    words = data[:, word_off:]
    pattern = _char_pattern(chars)[:, None]
    widx = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)[None, :]
    within32 = within.astype(jnp.int32)
    nvalid = jnp.clip(within32[:, None] - widx * 16, 0, 16)
    x = words ^ pattern
    y = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    shift = (2 * jnp.clip(nvalid, 0, 15)).astype(jnp.uint32)
    mask = jnp.where(nvalid >= 16, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << shift) - 1)
    cnt = jax.lax.population_count(y & mask).astype(jnp.int32).sum(
        axis=1, dtype=jnp.int32)
    if word_off == 8:
        lo = _select_col(data[:, :4], chars).astype(jnp.int64)
        hi = _select_col(data[:, 4:8], chars).astype(jnp.int64)
        base = lo | (hi << 32)
    else:
        base = _select_col(data[:, :4], chars).astype(jnp.int32)
    adj = ((chars == 0) & (zoff < rows)).astype(jnp.int32)
    return base + cnt - adj


def fused_step_lookup1(ufm: jax.Array, nblk: int, fchr: jax.Array, zoff,
                       starting: jax.Array, pending: jax.Array,
                       fi: jax.Array, top: jax.Array, bot: jax.Array,
                       chars: jax.Array, nblk12: int = 0,
                       use12: jax.Array = None, fi12: jax.Array = None):
    """ONE row gather per lane per step (halving the round-2 step cost,
    whose 2L-row gather was ~90% of device search time).

    Each lane reads exactly one row: its packed ftab row (starting), the
    block row of `top` (extending; serves the top rank AND -- when `bot`
    lies within or at the end of top's block, the common case once the
    range narrows -- the bot rank via the same 512-base window), or the
    block row of `bot` (lanes the search loop deferred one step because
    bot was out of the top block's reach).

    Returns (ftop, fbot, lf_top, b2_row, topchar, in_reach). b2_row is
    the bot-side LF for extending lanes with in_reach, and for pending
    lanes; other entries are only meaningful for lanes in the matching
    phase. The split-step trick is exact: a deferred lane's state is
    frozen, so its transition is computed identically one iteration
    later (hi_aligner.h:981-1007 semantics are per-lane).
    """
    word_off = _layout_word_off(ufm)
    wide = word_off == 8
    idt = jnp.int64 if wide else jnp.int32
    per_shift = 3 if wide else 4          # ftab entries per row

    frow = nblk + (fi >> per_shift).astype(idt)
    if nblk12:
        # deep-prime lanes read their depth-12 ftab row instead (same
        # row layout; the region starts at ufm[nblk12])
        frow = jnp.where(use12, nblk12 + (fi12 >> per_shift).astype(idt),
                         frow)
        fi = jnp.where(use12, fi12, fi)
    blk_t = top >> 9
    prow = jnp.where(starting, frow,
                     jnp.where(pending, bot >> 9, blk_t))
    g = ufm[prow]                                     # (L, W): ONE gather

    # --- ftab extraction (starting lanes) ---
    if wide:
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

    # --- rank extraction: top (own block) + bot (same row) ---
    # bot's rank comes from the SAME gathered row: for extending lanes
    # with bot <= end of top's block the window [0, bot - blk_t*512]
    # covers it (within == 512 counts the full block, which equals the
    # next block's occ checkpoint); for pending lanes the row IS bot's
    # block and the usual bot & 511 window applies.
    in_reach = bot <= (blk_t + 1) * 512
    within_t = (top & 511).astype(jnp.int32)
    within_b = jnp.where(
        pending, (bot & 511).astype(jnp.int32),
        jnp.clip(bot - (blk_t << 9), 0, 512).astype(jnp.int32))
    r_t = _rank_from_rows(g, within_t, chars, zoff, top, word_off)
    r_b = _rank_from_rows(g, within_b, chars, zoff, bot, word_off)
    base = _fchr_select(fchr, chars)
    word = _select_col(g[:, word_off:], within_t >> 4)
    topchar = ((word.astype(jnp.uint32)
                >> (2 * (top & 15).astype(jnp.uint32))) & 3).astype(jnp.int32)
    return ftop, fbot, base + r_t, base + r_b, topchar, in_reach


@jax.jit
def _ftab12_rows_graph(ufm: jax.Array, fchr: jax.Array, zoff,
                       t0: jax.Array, b0: jax.Array) -> jax.Array:
    """Depth-12 ftab packed rows computed ON DEVICE: the batched twin of
    native/fmwalk.cpp fm_ftab_extend (two guarded LF extensions per
    depth-10 entry x 16 two-char suffixes), emitting the same block-row
    layout as pack_ftab_rows. 33.5M rank queries become five batched
    2^22-lane LF blocks -- sub-second on the TPU vs minutes of host rank
    walking at 12 Gbp, and the 268 MB table never rides the tunnel.

    Guard semantics mirror the C++ exactly (fmwalk.cpp:226-246): an
    empty parent range writes (0, 0) at level 1, and level 2 writes the
    LF pair only when its level-1 parent is non-empty (the result may
    itself be empty -- stored as-is, same as the host path).
    """
    word_off = _layout_word_off(ufm)
    wide = word_off == 8
    width = ufm.shape[1]
    n10 = t0.shape[0]
    # level-1 index layout: idx1 = e10 | (c10 << 20) == c10 * n10 + e10
    t = jnp.tile(t0, 4)
    b = jnp.tile(b0, 4)
    chars1 = jnp.repeat(jnp.arange(4, dtype=jnp.int32), n10)
    zero = jnp.zeros((), t.dtype)
    ok0 = b > t
    t1 = jnp.where(ok0, lf_kernel(ufm, fchr, zoff, t, chars1), zero)
    b1 = jnp.where(ok0, lf_kernel(ufm, fchr, zoff, b, chars1), zero)
    ok1 = b1 > t1
    outs_t, outs_b = [], []
    for c11 in range(4):            # idx = e10 | c10<<20 | c11<<22
        ch = jnp.full_like(chars1, c11)
        outs_t.append(jnp.where(ok1, lf_kernel(ufm, fchr, zoff, t1, ch),
                                zero))
        outs_b.append(jnp.where(ok1, lf_kernel(ufm, fchr, zoff, b1, ch),
                                zero))
    t12 = jnp.concatenate(outs_t)
    b12 = jnp.concatenate(outs_b)
    if wide:                        # pack_ftab_rows layout, on device
        tu = t12.astype(jnp.uint64)
        bu = b12.astype(jnp.uint64)
        quads = jnp.stack([
            (tu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (tu >> 32).astype(jnp.uint32),
            (bu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (bu >> 32).astype(jnp.uint32)], axis=1)
        fr = quads.reshape(-1, 32)
    else:
        pairs = jnp.stack([t12.astype(jnp.uint32),
                           b12.astype(jnp.uint32)], axis=1)
        fr = pairs.reshape(-1, 32)
    return jnp.pad(fr, ((0, 0), (0, width - fr.shape[1])))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def _ufm_write_rows(ufm: jax.Array, fr: jax.Array, row_off: int):
    """Write the device-computed ftab12 rows into their (zero-filled)
    region of the unified table; donation makes it in-place so the
    4 GB-scale table is never doubled in HBM."""
    return jax.lax.dynamic_update_slice(ufm, fr, (row_off, 0))


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
    return _fchr_select(fchr, chars) + rank_kernel(blocks, zoff, rows, chars)


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


def _try_offset(blocks, offs, boundary_rows, boundary_refs, zoff, rows,
                sample_mask, offrate, has_bounds, narrow):
    """Sample/boundary/$ exits for the current rows (-1 = keep walking)."""
    tidx = jnp.full(rows.shape, -1, jnp.int32)
    sampled = (rows & sample_mask) == 0
    si = jnp.clip(rows >> offrate, 0,
                  offs.shape[0] * (offs.shape[1] if offs.ndim == 2
                                   else 1) - 1)
    if offs.ndim == 2:
        srow = offs[si >> 3]                       # (B, 8) row gather
        sval = _select_col(srow, (si & 7).astype(jnp.int32))
    else:
        sval = offs[si]
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


def _resolve_body(blocks, fchr, offs, boundary_rows, boundary_refs, zoff,
                  sample_mask, offrate, has_bounds, narrow, unroll: int = 8):
    """The unrolled while_loop body of the LF resolve walk."""
    word_off = _layout_word_off(blocks)

    def step(state):
        rows, tidx, it = state
        unresolved = tidx < 0
        step_rows = jnp.where(unresolved, rows, 0)
        # ONE gather serves both BWT[row] and rank_c(row)
        data = blocks[step_rows >> 9]
        within = (step_rows & 511).astype(jnp.int32)
        word = _select_col(data[:, word_off:], within >> 4)
        c = ((word.astype(jnp.uint32)
              >> (2 * (step_rows & 15).astype(jnp.uint32))) & 3
             ).astype(jnp.int32)
        nxt = _fchr_select(fchr, c) + _rank_from_rows(
            data, within, c, zoff, step_rows, word_off)
        rows = jnp.where(unresolved, nxt, rows)
        t2 = _try_offset(blocks, offs, boundary_rows, boundary_refs, zoff,
                         rows, sample_mask, offrate, has_bounds, narrow)
        tidx = jnp.where(unresolved, t2, tidx)
        return rows, tidx, it + 1

    def body(state):
        # the step is a no-op on resolved rows, so unrolling amortizes
        # per-iteration dispatch overhead without changing results
        for _ in range(unroll):
            state = step(state)
        return state

    return body


def resolve_rows_core(blocks, fchr, offs, boundary_rows, boundary_refs,
                      zoff, rows, sample_mask: int, offrate: int,
                      has_bounds: bool, narrow: bool, max_steps: int):
    """Traceable SA-row -> tidx walk; composable into larger jits (the
    fused search+resolve dispatch) as well as the standalone resolver."""
    def cond(state):
        rows_, tidx_, it = state
        return (tidx_ < 0).any() & (it < max_steps)

    tidx = _try_offset(blocks, offs, boundary_rows, boundary_refs, zoff,
                       rows, sample_mask, offrate, has_bounds, narrow)
    rows, tidx, _ = jax.lax.while_loop(
        cond, _resolve_body(blocks, fchr, offs, boundary_rows,
                            boundary_refs, zoff, sample_mask, offrate,
                            has_bounds, narrow),
        (rows, tidx, jnp.int32(0)))
    return tidx


def resolve_rows_two_phase(blocks, fchr, offs, boundary_rows, boundary_refs,
                           zoff, rows, sample_mask: int, offrate: int,
                           has_bounds: bool, narrow: bool, max_steps: int,
                           phase1_steps: int, phase2_frac: int = 8):
    """Width-compacted LF walk for LARGE indexes.

    The walk length is geometric (P(>k) = ((2^offrate-1)/2^offrate)^k) but
    lockstep makes every row pay the max over the batch (~170 steps at
    32k rows, offrate 4) -- and on a multi-GB blocks table each row
    gather is HBM-latency-bound (~100-200 ns/row), so the tail dominates
    the fused dispatch. Phase 1 walks all W rows `phase1_steps` steps;
    survivors compact (monotone searchsorted+gather -- scatter would
    serialize) into W/phase2_frac slots and only they pay the tail.

    Returns (keys, tidx, keys2, tidx2): the phase-1 keys have unresolved
    entries masked to -1 (a row value no real request matches, so the
    host prefetch cache treats them as misses); phase-2 survivors come
    back as the extra (keys2, tidx2) pair. Survivors that overflow the
    phase-2 width or outlast max_steps also stay masked -- correctness
    never depends on the walk finishing, only the fallback batch does.
    """
    def walk(r0, t0, steps):
        def cond(state):
            rows_, tidx_, it = state
            return (tidx_ < 0).any() & (it < steps)
        return jax.lax.while_loop(
            cond, _resolve_body(blocks, fchr, offs, boundary_rows,
                                boundary_refs, zoff, sample_mask, offrate,
                                has_bounds, narrow),
            (r0, t0, jnp.int32(0)))

    t0 = _try_offset(blocks, offs, boundary_rows, boundary_refs, zoff,
                     rows, sample_mask, offrate, has_bounds, narrow)
    rows1, tidx1, _ = walk(rows, t0, phase1_steps)

    W = rows.shape[0]
    W2 = max(min(W, 64), W // phase2_frac)
    unres = tidx1 < 0
    cs = jnp.cumsum(unres.astype(jnp.int32))
    src = jnp.searchsorted(cs, jnp.arange(1, W2 + 1, dtype=jnp.int32))
    valid2 = jnp.arange(W2, dtype=jnp.int32) < cs[-1]
    srcc = jnp.clip(src, 0, W - 1)
    rows2 = jnp.where(valid2, rows1[srcc], 0)
    keys2 = jnp.where(valid2, rows[srcc], -1)
    t2 = jnp.where(valid2, jnp.int32(-1), jnp.int32(0))
    rows2, tidx2, _ = walk(rows2, t2, max_steps - phase1_steps)

    keys1 = jnp.where(unres, jnp.asarray(-1, rows.dtype), rows)
    keys2 = jnp.where(tidx2 < 0, jnp.asarray(-1, rows.dtype), keys2)
    return keys1, tidx1, keys2, tidx2


@functools.partial(jax.jit, static_argnames=("sample_mask", "offrate",
                                             "has_bounds", "narrow",
                                             "max_steps"))
def _resolve_rows(blocks, fchr, offs, boundary_rows, boundary_refs, zoff,
                  rows, sample_mask: int, offrate: int, has_bounds: bool,
                  narrow: bool, max_steps: int):
    """Jitted wrapper over resolve_rows_core; module-level so the compile
    is cached across pipeline instances."""
    return resolve_rows_core(blocks, fchr, offs, boundary_rows,
                             boundary_refs, zoff, rows, sample_mask,
                             offrate, has_bounds, narrow, max_steps)


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
