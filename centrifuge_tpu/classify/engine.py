"""Batched FM backward-search engine: thousands of reads in lockstep.

The per-read greedy partial-hit scan (hi_aligner.h:902-1031 + the
classifier driver policy, classifier.h:666-772) is re-expressed as a
vectorized integer state machine: every lane is one (read, strand) pair;
one `lax.while_loop` iteration performs, per lane, either a search start
(N-window check + ftab prime) or a one-character LF extension. All memory
traffic is batched gathers into the block-packed BWT (ops/fm_jax.py), so
the machine is HBM-bandwidth-bound, which is the design target for TPU.

The loop body is parameterized over a small kernel namespace (`FMKernels`)
so the same policy code drives both the single-chip path (direct gathers)
and the BWT-range-sharded multi-chip path (masked local gathers + psum
over the index axis; parallel/sharded.py).

Hits are written into fixed-size per-lane buffers; the host converts them
into the same PartialHit lists the oracle produces, and the remaining
(cheap, irregular) per-read logic is shared host code (classify/algo.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fm_jax import (DeviceFMIndex, bwt_char_kernel, lf_kernel)



@dataclass
class FMKernels:
    """The device primitives the search loop needs.

    ftab_lookup: int32[B] packed-window ids -> (top[B], bot[B]);
                 ONE gather over the stacked (n, 2) table.
    lf_pair:     (rows_t[B], rows_b[B], chars[B]) ->
                 (LF(top,c)[B], LF(bot,c)[B], BWT[top][B]);
                 ONE gather over the concatenated 2B rows -- each
                 gather op costs ~fixed latency on TPU, so merging the
                 top/bot/char lookups halves the per-step op count.
    lf/bwt_char: single-row variants (used by the resolver path).
    zoff:        the '$' row (traced scalar ok)
    """

    ftab_lookup: Callable
    lf_pair: Callable
    lf: Callable
    bwt_char: Callable
    zoff: jnp.ndarray
    num_ftab: int
    row_dtype: object = jnp.int32


def _precompute_windows(rseq: jax.Array, ftab_chars: int):
    """Per-position ftab integers and first-N offsets.

    rseq: (L, Lmax+ftab_chars) int32, reversed reads padded with 0s.
    Returns fi (L, Lmax) int32 and first_n (L, Lmax) int32 in [0, fc].
    fi packs the window so the char nearest the right end of the read sits
    in the least-significant bit-pair (bt2_idx.h:1830-1854 with fw()).
    """
    L, Lpad = rseq.shape
    lmax = Lpad - ftab_chars
    fi = jnp.zeros((L, lmax), dtype=jnp.int32)
    first_n = jnp.full((L, lmax), ftab_chars, dtype=jnp.int32)
    for j in range(ftab_chars - 1, -1, -1):
        cj = jax.lax.dynamic_slice_in_dim(rseq, j, lmax, axis=1)
        fi = fi | (jnp.clip(cj, 0, 3) << (2 * j))
        first_n = jnp.where(cj > 3, jnp.int32(j), first_n)
    return fi, first_n


def search_loop(kern: FMKernels, rseq, lengths, start_cur,
                min_hitlen: int, increment: int, max_hits: int,
                first_hit_only: bool, unroll: int = 4):
    """Run the full per-strand greedy scan for every lane.

    rseq: (L, Lmax + fc) int32 reversed+padded reads.
    lengths: (L,) int32; start_cur: (L,) int32 initial cursors.
    Returns (hit_top, hit_bot, hit_bwoff, hit_len, nhits, sums): hits in
    emission order; empty pseudo-hits have top == bot == -1.

    The loop body is a pure per-lane state transition that is a no-op on
    done lanes, so unrolling it `unroll` times per while_loop iteration
    preserves semantics exactly while amortizing the per-iteration
    dispatch overhead (the scan runs hundreds of tiny steps otherwise).
    """
    fc = 10  # ftab_chars; geometry fixed by the index format default
    L, P = rseq.shape
    fi_tab, firstn_tab = _precompute_windows(rseq, fc)
    # pack [char, fi, firstn] per position into one (L, P, 3) table so a
    # step reads ONE gathered (L, 3) row instead of three separate
    # gathers (fi/firstn padded on the right; those positions are only
    # reachable by extending lanes, which use just the char column)
    pad = jnp.zeros((L, fc), jnp.int32)
    rtab = jnp.stack([rseq,
                      jnp.concatenate([fi_tab, pad], axis=1),
                      jnp.concatenate([firstn_tab, pad], axis=1)], axis=2)
    lanes = jnp.arange(L, dtype=jnp.int32)
    idt = kern.row_dtype  # int64 on the wide (>2^31 bases) path

    state = dict(
        cur=start_cur,
        done=lengths <= start_cur,
        mode=jnp.zeros(L, jnp.int32),        # 0 = start, 1 = extend
        offset=jnp.zeros(L, jnp.int32),
        dep=jnp.zeros(L, jnp.int32),
        top=jnp.zeros(L, idt),
        bot=jnp.zeros(L, idt),
        nhits=jnp.zeros(L, jnp.int32),
        sums=jnp.zeros(L, jnp.int32),
        # [top, bot, off, len] per hit slot; single scatter per step
        h_all=jnp.tile(jnp.array([-1, -1, 0, 0], idt),
                       (L, max_hits, 1)),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def step(s):
        cur, done, mode = s["cur"], s["done"], s["mode"]
        n = lengths
        active = ~done
        starting = active & (mode == 0)
        extending = active & (mode == 1)

        # one positional gather: starters read [fi, firstn] at cur,
        # extenders read the char at dep
        dep, top, bot = s["dep"], s["top"], s["bot"]
        pos = jnp.where(starting, cur, dep)
        row3 = rtab[lanes, jnp.clip(pos, 0, P - 1)]        # (L, 3)
        c = row3[:, 0]
        fi = jnp.clip(row3[:, 1], 0, kern.num_ftab - 1)
        fN = row3[:, 2]

        # ---------------- start phase ----------------
        left = n - cur
        case_a = starting & (left < fc)
        case_b = starting & ~case_a & (fN < fc)
        ftop, fbot = kern.ftab_lookup(fi)
        case_c_empty = starting & ~case_a & ~case_b & (fbot <= ftop)
        case_c_go = starting & ~case_a & ~case_b & (fbot > ftop)

        start_newcur = jnp.where(
            case_a, n, jnp.where(case_b, cur + fN + 1, cur + fc))
        start_emit = case_a | case_b | case_c_empty

        # ---------------- extend phase ----------------
        at_end = extending & (dep >= n)
        stepping = extending & (dep < n)
        cq = jnp.clip(c, 0, 3)
        rows_t = jnp.where(stepping, top, 0)
        rows_b = jnp.where(stepping, bot, 0)
        t2, b2_full, topchar = kern.lf_pair(rows_t, rows_b, cq)
        single = (bot - top) == 1
        b2 = jnp.where(single, t2 + 1, b2_full)
        fail = stepping & (
            (c > 3)
            | (single & ((topchar != cq) | (top == kern.zoff)))
            | (b2 <= t2))
        advance = stepping & ~fail
        ext_emit = at_end | fail

        # ---------------- emission ----------------
        emit = start_emit | ext_emit
        e_top = jnp.where(ext_emit, top, jnp.asarray(-1, idt))
        e_bot = jnp.where(ext_emit, bot, jnp.asarray(-1, idt))
        e_off = jnp.where(ext_emit, s["offset"], cur)
        e_cur = jnp.where(ext_emit, dep, start_newcur)  # cursor after search
        e_len = e_cur - e_off

        slot = jnp.clip(s["nhits"], 0, max_hits - 1)
        rec = jnp.stack([e_top, e_bot, e_off.astype(idt),
                         e_len.astype(idt)], axis=1)            # (L, 4)
        old = s["h_all"][lanes, slot]
        h_all = s["h_all"].at[lanes, slot].set(
            jnp.where(emit[:, None], rec, old))
        nhits = s["nhits"] + emit.astype(jnp.int32)
        sums = s["sums"] + jnp.where(emit & (e_len >= min_hitlen), e_len, 0)

        # ---------------- post-emission driver policy ----------------
        # partialSearch marks done when the cursor reaches the read end;
        # otherwise the driver may skip one position and re-checks the
        # tail-room bound (classifier.h:685-766)
        done_search = emit & (e_cur >= n)
        policy = emit & ~done_search
        cur_after = jnp.where(
            policy & (e_len > increment), e_cur + 1, e_cur)
        new_done_lane = done_search | (policy & (cur_after + min_hitlen >= n))
        if first_hit_only:
            new_done_lane = emit  # single partialSearch per lane

        new_cur = jnp.where(emit, cur_after, cur)
        new_done = done | (emit & new_done_lane)
        new_mode = jnp.where(emit, 0, jnp.where(case_c_go, 1, mode))
        new_offset = jnp.where(case_c_go, cur, s["offset"])
        new_dep = jnp.where(case_c_go, cur + fc,
                            jnp.where(advance, dep + 1, dep))
        new_top = jnp.where(case_c_go, ftop, jnp.where(advance, t2, top))
        new_bot = jnp.where(case_c_go, fbot, jnp.where(advance, b2, bot))

        return dict(cur=new_cur, done=new_done, mode=new_mode,
                    offset=new_offset, dep=new_dep, top=new_top,
                    bot=new_bot, nhits=nhits, sums=sums, h_all=h_all)

    def body(s):
        for _ in range(unroll):
            s = step(s)
        return s

    out = jax.lax.while_loop(cond, body, state)
    h = out["h_all"]
    return (h[:, :, 0], h[:, :, 1], h[:, :, 2], h[:, :, 3],
            out["nhits"], out["sums"])


def direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff) -> FMKernels:
    """Single-device kernel set: plain gathers into replicated arrays."""
    from ..ops.fm_jax import WORDS_PER_BLOCK, rank_in_block
    word_off = 8 if fm_blocks.shape[1] == 8 + WORDS_PER_BLOCK else 4

    def ftab_lookup(fi):
        tb = fm_ftab_tb[fi]                    # (B, 2): one gather
        return tb[:, 0], tb[:, 1]

    def lf_pair(rows_t, rows_b, chars):
        B = rows_t.shape[0]
        rows = jnp.concatenate([rows_t, rows_b])
        ch2 = jnp.concatenate([chars, chars])
        blk = rows >> 9
        within = (rows & 511).astype(jnp.int32)
        data = fm_blocks[blk]                  # (2B, 36|40): one gather
        r = rank_in_block(data, within, ch2, zoff, rows, word_off)
        lf = fm_fchr[ch2] + r
        word = data[jnp.arange(B), word_off + (within[:B] >> 4)]
        topchar = ((word >> (2 * (within[:B] & 15).astype(jnp.uint32))) & 3
                   ).astype(jnp.int32)
        return lf[:B], lf[B:], topchar

    return FMKernels(
        ftab_lookup=ftab_lookup,
        lf_pair=lf_pair,
        lf=lambda rows, chars: lf_kernel(fm_blocks, fm_fchr, zoff, rows, chars),
        bwt_char=lambda rows: bwt_char_kernel(fm_blocks, rows),
        zoff=zoff,
        num_ftab=fm_ftab_tb.shape[0],
        row_dtype=fm_ftab_tb.dtype,
    )


@functools.partial(jax.jit, static_argnames=("min_hitlen", "increment",
                                             "max_hits", "first_hit_only"))
def batched_search(fm_blocks, fm_fchr, fm_ftab_tb, zoff,
                   rseq, lengths, start_cur,
                   min_hitlen: int, increment: int, max_hits: int,
                   first_hit_only: bool):
    """Single-chip full scan over all lanes (see search_loop)."""
    kern = direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff)
    return search_loop(kern, rseq, lengths, start_cur, min_hitlen,
                       increment, max_hits, first_hit_only)


@functools.partial(jax.jit, static_argnames=("min_hitlen", "increment",
                                             "max_hits", "first_hit_only"))
def batched_search_packed(fm_blocks, fm_fchr, fm_ftab_tb, zoff,
                          rseq, lengths, start_cur,
                          min_hitlen: int, increment: int, max_hits: int,
                          first_hit_only: bool):
    """As batched_search, but packs all outputs into ONE (L, 4*mh+2)
    int32 array on device: [h_top | h_bot | h_off | h_len | nhits | sums].
    A single device->host transfer matters when the device sits behind a
    network tunnel with per-fetch latency."""
    kern = direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff)
    h_top, h_bot, h_off, h_len, nhits, sums = search_loop(
        kern, rseq, lengths, start_cur, min_hitlen, increment, max_hits,
        first_hit_only)
    idt = kern.row_dtype
    return jnp.concatenate(
        [h_top, h_bot, h_off, h_len,
         nhits.astype(idt)[:, None], sums.astype(idt)[:, None]], axis=1)


def _bucket(n: int, lo: int = 256) -> int:
    """Round up to a power of two (>= lo) so repeated batches hit the
    jit cache instead of recompiling per shape."""
    b = lo
    while b < n:
        b <<= 1
    return b


class BatchSearchEngine:
    """Host wrapper: pack reads -> device search -> PartialHit lists.

    Shapes are bucketed (lane count and read length rounded up to powers
    of two) so the search kernel compiles once per bucket; dead padding
    lanes have length 0 and finish immediately. The hit buffer starts
    small (max_hits=16, the overwhelmingly common case) and lanes that
    overflow are re-run once with a full-size buffer.
    """

    FIRST_MAX_HITS = 16

    def __init__(self, fm: DeviceFMIndex, min_hitlen: int = 22):
        self.fm = fm
        self.min_hitlen = min_hitlen
        self.increment = 10 if 2 * min_hitlen <= 33 else 2 * min_hitlen - 33

    def pack(self, seqs: List[np.ndarray], lmax: int,
             nlanes: int) -> Tuple[np.ndarray, np.ndarray]:
        fc = self.fm.ftab_chars
        rseq = np.zeros((nlanes, lmax + fc), dtype=np.int32)
        lengths = np.zeros(nlanes, dtype=np.int32)
        for i, s in enumerate(seqs):
            lengths[i] = len(s)
            rseq[i, :len(s)] = s[::-1].astype(np.int32)
        return rseq, lengths

    def _run(self, rseq, lengths, start, max_hits, first_hit_only):
        packed = np.asarray(batched_search_packed(
            self.fm.blocks, self.fm.fchr, self.fm.ftab_tb,
            jnp.asarray(self.fm.zoff, self.fm.row_dtype),
            jnp.asarray(rseq), jnp.asarray(lengths),
            jnp.asarray(start), min_hitlen=self.min_hitlen,
            increment=self.increment, max_hits=max_hits,
            first_hit_only=first_hit_only))
        m = max_hits
        return [packed[:, :m], packed[:, m:2 * m], packed[:, 2 * m:3 * m],
                packed[:, 3 * m:4 * m], packed[:, 4 * m], packed[:, 4 * m + 1]]

    def search_async(self, seqs: List[np.ndarray]):
        """Dispatch the device search without blocking; returns a handle
        for search_collect. jax execution is async, so the device starts
        working while the host moves on."""
        L = len(seqs)
        lmax = _bucket(max((len(s) for s in seqs), default=1), lo=32)
        nlanes = _bucket(L)
        rseq, lengths = self.pack(seqs, lmax, nlanes)
        start = np.zeros(nlanes, dtype=np.int32)
        mh = min(self.FIRST_MAX_HITS, lmax)
        packed = batched_search_packed(
            self.fm.blocks, self.fm.fchr, self.fm.ftab_tb,
            jnp.asarray(self.fm.zoff, self.fm.row_dtype),
            jnp.asarray(rseq), jnp.asarray(lengths),
            jnp.asarray(start), min_hitlen=self.min_hitlen,
            increment=self.increment, max_hits=mh, first_hit_only=False)
        return (packed, rseq, lengths, mh, lmax, nlanes)

    def search_collect(self, handle, L: int):
        """Block on a search_async handle and return per-lane arrays."""
        packed, rseq, lengths, mh, lmax, nlanes = handle
        packed = np.asarray(packed)
        out = [packed[:, :mh], packed[:, mh:2 * mh], packed[:, 2 * mh:3 * mh],
               packed[:, 3 * mh:4 * mh], packed[:, 4 * mh],
               packed[:, 4 * mh + 1]]
        out = self._handle_overflow(out, rseq, lengths, mh, lmax, nlanes)
        return [a[:L] for a in out]

    def search(self, seqs: List[np.ndarray]):
        """Full scan for each sequence; returns per-lane raw hit arrays."""
        L = len(seqs)
        lmax = _bucket(max((len(s) for s in seqs), default=1), lo=32)
        nlanes = _bucket(L)
        rseq, lengths = self.pack(seqs, lmax, nlanes)
        start = np.zeros(nlanes, dtype=np.int32)
        mh = min(self.FIRST_MAX_HITS, lmax)
        out = self._run(rseq, lengths, start, mh, False)
        out = self._handle_overflow(out, rseq, lengths, mh, lmax, nlanes)
        return [a[:L] for a in out]

    def _handle_overflow(self, out, rseq, lengths, mh, lmax, nlanes):
        over = np.nonzero(out[4] > mh)[0]
        if over.shape[0]:
            # rare: a lane emitted more hits than the small buffer holds
            nover = _bucket(over.shape[0], lo=32)
            rseq2 = np.zeros((nover, rseq.shape[1]), dtype=np.int32)
            rseq2[: over.shape[0]] = rseq[over]
            lengths2 = np.zeros(nover, dtype=np.int32)
            lengths2[: over.shape[0]] = lengths[over]
            full = self._run(rseq2, lengths2,
                             np.zeros(nover, dtype=np.int32), lmax, False)
            wide = [np.zeros((nlanes, lmax), a.dtype) if a.ndim == 2 else a
                    for a in out]
            for k in range(4):
                wide[k][:, :mh] = out[k]
                wide[k][over] = full[k][: over.shape[0]]
            wide[4] = out[4].copy()
            wide[4][over] = full[4][: over.shape[0]]
            wide[5] = out[5].copy()
            wide[5][over] = full[5][: over.shape[0]]
            out = wide
        return out

    FIRST_HITS_CHUNK = 4096

    def search_first_hits(self, seqs: List[np.ndarray], offsets: np.ndarray):
        """One partialSearch per lane from the given offsets (extension pass).

        Lanes run in fixed-size chunks so the kernel compiles for exactly
        one shape regardless of how many extension misses a batch has."""
        L = len(seqs)
        lmax = _bucket(max((len(s) for s in seqs), default=1), lo=32)
        chunk = self.FIRST_HITS_CHUNK
        outs = []
        for c0 in range(0, L, chunk):
            part = seqs[c0: c0 + chunk]
            rseq, lengths = self.pack(part, lmax, chunk)
            start = np.zeros(chunk, dtype=np.int32)
            start[: len(part)] = offsets[c0: c0 + chunk].astype(np.int32)
            out = self._run(rseq, lengths, start, 1, True)
            outs.append([a[: len(part)] for a in out])
        if len(outs) == 1:
            return outs[0]
        return [np.concatenate([o[k] for o in outs]) for k in range(6)]
