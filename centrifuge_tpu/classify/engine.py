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
import os
import threading
from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fm_jax import (DeviceFMIndex, bwt_char_kernel,
                          fused_step_lookup1, lf_kernel)



@dataclass
class FMKernels:
    """The device primitives the search loop needs.

    step_lookup1: (starting, pending, fi, top, bot, chars) ->
                 (ftop, fbot, lf_t, b2_row, topchar, in_reach); ONE row
                 gather per lane per step (fm_jax.fused_step_lookup1):
                 the ftab prime, the top rank, and -- when bot lies
                 within reach of top's block, the common case -- the bot
                 rank all come from the same gathered row; out-of-reach
                 lanes defer one step (the loop's `pend` state) and read
                 bot's block then. Gathers are row-count-bound on TPU,
                 so this halves the hot-step cost vs the 2L-row form.
                 When None, the loop composes ftab_lookup + lf_pair (the
                 BWT-range-sharded path, which gathers top and bot rows
                 through its own psum machinery).
    ftab_lookup: int32[B] packed-window ids -> (top[B], bot[B]).
    lf_pair:     (rows_t[B], rows_b[B], chars[B]) ->
                 (LF(top,c)[B], LF(bot,c)[B], BWT[top][B]).
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
    step_lookup1: Callable = None
    deep: bool = False   # step_lookup1 accepts (use12, fi12): the index
                         # carries a load-time depth-12 ftab region
                         # (fm_jax.DeviceFMIndex.nblk12) and eligible
                         # starts prime 12 chars in one step


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


def _pack_read_table(rseq: jax.Array, ftab_chars: int):
    """Pack (char, firstn, fi) per position into ONE int32:
    bits 0-2 char, 3-6 firstN, 7-26 ftab window.

    Rows of 8 positions so the per-step positional read is a row gather
    (L rows of 32 B) + a fused 8-way column select instead of a scalar
    gather. Returns (table[(L*Pw8), 8], Pw8).
    """
    L, P = rseq.shape
    fi_tab, firstn_tab = _precompute_windows(rseq, ftab_chars)
    pad = jnp.zeros((L, ftab_chars), jnp.int32)
    fi_full = jnp.concatenate([fi_tab, pad], axis=1)
    fn_full = jnp.concatenate([firstn_tab, pad], axis=1)
    val = jnp.clip(rseq, 0, 7) | (fn_full << 3) | (fi_full << 7)
    Pw = ((P + 7) // 8) * 8
    if Pw != P:
        val = jnp.concatenate(
            [val, jnp.zeros((L, Pw - P), jnp.int32)], axis=1)
    return val.reshape(L * (Pw // 8), 8), Pw // 8


def _row_select(tab: jax.Array, col: jax.Array) -> jax.Array:
    """tab[i, col[i]] as a masked sum: row-aligned per-lane selects are
    pure elementwise work, which the step ablation measured as ~free,
    while a flat gather of the same values costs ~300 us/step at 16k
    lanes (gathers are row-count-bound and dominate the search step)."""
    idx = jnp.arange(tab.shape[1], dtype=jnp.int32)[None, :]
    return jnp.where(idx == col[:, None], tab, 0).sum(axis=1,
                                                      dtype=tab.dtype)


def _pack_read_words(rseq: jax.Array):
    """Pack each lane's codes into 2-bit words + a 1-bit N map.

    words:  uint32 (L, W+1), 16 positions per word (LSB-first), N clipped
            to code 3 exactly as the ftab window builder does.
    nwords: uint32 (L, W+1), 16 positions per word, bit j = code>3.
    The trailing zero column lets window reads at cur>>4 == W-1 fetch
    word W without bounds checks. Replaces the per-step read-table row
    gather entirely: the step reads both arrays with _row_select.
    """
    L, P = rseq.shape
    W = (P + 15) // 16
    r = rseq
    if W * 16 != P:
        r = jnp.concatenate(
            [r, jnp.zeros((L, W * 16 - P), jnp.int32)], axis=1)
    r = r.reshape(L, W, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    words = (jnp.clip(r, 0, 3).astype(jnp.uint32) << shifts).sum(
        axis=2, dtype=jnp.uint32)
    nsh = jnp.arange(16, dtype=jnp.uint32)[None, None, :]
    nwords = ((r > 3).astype(jnp.uint32) << nsh).sum(
        axis=2, dtype=jnp.uint32)
    pad = jnp.zeros((L, 1), jnp.uint32)
    return (jnp.concatenate([words, pad], axis=1),
            jnp.concatenate([nwords, pad], axis=1))


def _unpack_rseq(packed):
    """Inverse of the host's 2-bases-per-byte transport packing: uint8
    (L, P/2) -> int32 (L, P). The read matrix crosses the host->device
    tunnel every batch (~4 MB at 16k lanes x 256 cols); halving its bytes
    is worth the two cheap device ops."""
    lo = (packed & 15).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=2).reshape(packed.shape[0], -1)


def _unpack_rseq2(packed):
    """Inverse of the 4-codes-per-byte transport (native cf_pack_reads2,
    N-free batches only): uint8 (L, P/4) -> int32 (L, P). Another 2x off
    the dominant host->device upload vs the 4-bit packing."""
    cols = [((packed >> (2 * k)) & 3).astype(jnp.int32) for k in range(4)]
    return jnp.stack(cols, axis=2).reshape(packed.shape[0], -1)


def _unpack_transport(rseq, packed_input):
    """packed_input: 0/False = raw int8 codes, 1/True = 4-bit transport,
    2 = 2-bit transport (N-free)."""
    if packed_input == 2:
        return _unpack_rseq2(rseq)
    if packed_input:
        return _unpack_rseq(rseq)
    return rseq.astype(jnp.int32)


def search_loop(kern: FMKernels, rseq, lengths, start_cur,
                min_hitlen: int, increment: int, max_hits: int,
                first_hit_only: bool, unroll: int = 8,
                count_steps: bool = False,
                segments: tuple = ()):
    """Run the full per-strand greedy scan for every lane.

    rseq: (L, Lmax + fc) int32 reversed+padded reads.
    lengths: (L,) int32; start_cur: (L,) int32 initial cursors.
    Returns (hit_top, hit_bot, hit_bwoff, hit_len, nhits, sums): hits in
    emission order; empty pseudo-hits have top == bot == -1.

    The loop body is a pure per-lane state transition that is a no-op on
    done lanes, so unrolling it `unroll` times per while_loop iteration
    preserves semantics exactly while amortizing the per-iteration
    overhead (~50 us per while_loop iteration on this backend). unroll=16
    runs marginally faster but doubles the (uncached, ~60 s per shape)
    tunnel compile; 8 is the compile/runtime sweet spot.
    """
    fc = 10  # ftab_chars; geometry fixed by the index format default
    L, P = rseq.shape
    # reads up to 2 kbp: per-lane packed code/N words + masked-sum
    # selects replace the read-table row gather (the gather was ~35% of
    # the whole search step; the selects are free VPU work). Longer
    # reads fall back to the gather (the masked sum grows with P).
    use_words = P <= 2048
    if use_words:
        rwords, rnwords = _pack_read_words(rseq)
    else:
        rtab, Pw8 = _pack_read_table(rseq, fc)
    lanes = jnp.arange(L, dtype=jnp.int32)
    slot_idx = jnp.arange(max_hits, dtype=jnp.int32)[None, :]
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
        # [top, bot, off, len] per hit slot; one-hot select per step
        h_all=jnp.tile(jnp.array([-1, -1, 0, 0], idt),
                       (L, max_hits, 1)),
    )
    if kern.step_lookup1 is not None:
        # bot-out-of-reach deferral (one-row-per-lane stepping): the
        # lane's frozen LF(top) while it waits one step for bot's block
        state["pend"] = jnp.zeros(L, jnp.bool_)
        state["t2p"] = jnp.zeros(L, idt)
    deep = kern.deep and use_words
    if deep:
        # deep-prime memo: a start whose depth-12 range came back empty
        # retries with the plain 10-char path next step
        state["no12"] = jnp.zeros(L, jnp.bool_)
    if count_steps:
        # lockstep-waste diagnostic: per-lane executed step count, so the
        # mean/max ratio (lanes idle while the slowest finishes) is
        # measurable on real workloads
        state["steps"] = jnp.zeros(L, jnp.int32)

    def cond(s):
        return jnp.any(~s["done"])

    def step(s, rw=None, rnw=None, nlen=None):
        # rw/rnw/nlen default to the full-width arrays; the segmented
        # runner rebinds them to compacted slices (same lane semantics,
        # fewer rows per step)
        if nlen is None:
            nlen = lengths
        if use_words and rw is None:
            rw, rnw = rwords, rnwords
        cur, done, mode = s["cur"], s["done"], s["mode"]
        n = nlen
        active = ~done
        starting = active & (mode == 0)
        extending = active & (mode == 1)

        dep, top, bot = s["dep"], s["top"], s["bot"]
        if use_words:
            # gather-free read access: all selects are row-aligned
            # masked sums over the per-lane packed words
            posc = jnp.clip(dep, 0, P - 1)
            wi_c = posc >> 4
            wsel = _row_select(rw, wi_c)
            nsel = _row_select(rnw, wi_c)
            shc = (2 * (posc & 15)).astype(jnp.uint32)
            c2 = ((wsel >> shc) & 3).astype(jnp.int32)
            nb = ((nsel >> (posc & 15).astype(jnp.uint32)) & 1)
            c = jnp.where(nb != 0, jnp.int32(4), c2)
            # ftab window + first-N at cur (starting lanes)
            cw = jnp.clip(cur, 0, P - 1)
            wi = cw >> 4
            w0 = _row_select(rw, wi)
            w1 = _row_select(rw, wi + 1)
            sh = (2 * (cw & 15)).astype(jnp.uint32)
            hi = jnp.where(sh > 0, w1 << ((32 - sh) & 31), jnp.uint32(0))
            win = ((w0 >> sh) | hi)
            fi = (win & 0xFFFFF).astype(jnp.int32)
            n0 = _row_select(rnw, wi)
            n1 = _row_select(rnw, wi + 1)
            shn = (cw & 15).astype(jnp.uint32)
            nhi = jnp.where(shn > 0, n1 << ((16 - shn) & 15),
                            jnp.uint32(0))
            nwin12 = ((n0 >> shn) | nhi) & jnp.uint32(0xFFF)
            nwin = nwin12 & jnp.uint32(0x3FF)
            lowbit = nwin & (~nwin + jnp.uint32(1))
            fN = jnp.where(
                nwin == 0, jnp.int32(fc),
                jax.lax.population_count(lowbit - 1).astype(jnp.int32))
        else:
            # one positional row gather: starters read [fi, firstn] at
            # cur, extenders read the char at dep
            pos = jnp.clip(jnp.where(starting, cur, dep), 0, P - 1)
            rrow = rtab[lanes * Pw8 + (pos >> 3)]              # (L, 8)
            v = jnp.where((jnp.arange(8, dtype=jnp.int32)[None, :]
                           == (pos & 7)[:, None]), rrow, 0).sum(
                               axis=1, dtype=jnp.int32)
            c = v & 7
            fi = v >> 7
            fN = (v >> 3) & 15

        # ---------------- merged device lookup ----------------
        cq = jnp.clip(c, 0, 3)
        one_row = kern.step_lookup1 is not None
        use12 = None
        if deep:
            fi12 = (win & 0xFFFFFF).astype(jnp.int32)
            use12 = starting & (n - cur >= 12) \
                & (nwin12 == 0) & ~s["no12"]
        if one_row:
            pend = s["pend"]
            pending = extending & pend
            at_end_pre = extending & ~pend & (dep >= n)
            stepping = extending & ~pend & (dep < n)
            if deep:
                ftop, fbot, t2, b2_row, topchar, in_reach = \
                    kern.step_lookup1(starting, pending, fi, top, bot,
                                      cq, use12=use12, fi12=fi12)
            else:
                ftop, fbot, t2, b2_row, topchar, in_reach = \
                    kern.step_lookup1(starting, pending, fi, top, bot, cq)
        else:
            pending = jnp.zeros_like(extending)
            at_end_pre = extending & (dep >= n)
            stepping = extending & (dep < n)
            rows_t = jnp.where(stepping, top, 0)
            rows_b = jnp.where(stepping, bot, 0)
            ftop, fbot = kern.ftab_lookup(fi)
            t2, b2_row, topchar = kern.lf_pair(rows_t, rows_b, cq)
            in_reach = jnp.ones_like(stepping)

        # ---------------- start phase ----------------
        left = n - cur
        plain = starting
        case12_go = case12_empty = None
        if deep:
            # deep prime: 12 chars in one lookup. Success jumps straight
            # to dep = cur + 12; an empty depth-12 range retries via the
            # plain path next step (exact: every reference trajectory
            # that fails before depth 12 has an empty 12-mer range, and
            # its emitted hit carries the depth-10/11 range the plain
            # path reproduces).
            plain = starting & ~use12
            case12_go = use12 & (fbot > ftop)
            case12_empty = use12 & ~case12_go
        case_a = plain & (left < fc)
        case_b = plain & ~case_a & (fN < fc)
        case_c_empty = plain & ~case_a & ~case_b & (fbot <= ftop)
        case_c_go = plain & ~case_a & ~case_b & (fbot > ftop)

        start_newcur = jnp.where(
            case_a, n, jnp.where(case_b, cur + fN + 1, cur + fc))
        start_emit = case_a | case_b | case_c_empty

        # ---------------- extend phase ----------------
        at_end = at_end_pre
        single = (bot - top) == 1
        b2 = jnp.where(single, t2 + 1, b2_row)
        # defer: multi-range lane whose bot rank needs bot's own block
        # (and whose char is valid -- N fails right away, no rank needed)
        defer = stepping & ~single & ~in_reach & (c <= 3)
        fail = stepping & ~defer & (
            (c > 3)
            | (single & ((topchar != cq) | (top == kern.zoff)))
            | (b2 <= t2))
        advance = stepping & ~defer & ~fail
        if one_row:
            # deferred lanes resolve now: their frozen LF(top) vs the
            # bot rank just read from bot's own block
            t2 = jnp.where(pending, s["t2p"], t2)
            b2 = jnp.where(pending, b2_row, b2)
            p_fail = pending & (b2 <= t2)
            fail = fail | p_fail
            advance = advance | (pending & ~p_fail)
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
        # one-hot select instead of scatter: XLA's dynamic scatter
        # serializes on TPU; this is a fused full-buffer where
        sel = (slot_idx == slot[:, None]) & emit[:, None]
        h_all = jnp.where(sel[:, :, None], rec[:, None, :], s["h_all"])
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

        case_go = case_c_go if not deep else (case_c_go | case12_go)
        new_cur = jnp.where(emit, cur_after, cur)
        new_done = done | (emit & new_done_lane)
        new_mode = jnp.where(emit, 0, jnp.where(case_go, 1, mode))
        new_offset = jnp.where(case_go, cur, s["offset"])
        go_dep = cur + fc if not deep else \
            jnp.where(case12_go, cur + 12, cur + fc)
        new_dep = jnp.where(case_go, go_dep,
                            jnp.where(advance, dep + 1, dep))
        new_top = jnp.where(case_go, ftop, jnp.where(advance, t2, top))
        new_bot = jnp.where(case_go, fbot, jnp.where(advance, b2, bot))

        out = dict(cur=new_cur, done=new_done, mode=new_mode,
                   offset=new_offset, dep=new_dep, top=new_top,
                   bot=new_bot, nhits=nhits, sums=sums, h_all=h_all)
        if deep:
            out["no12"] = jnp.where(case12_empty, True,
                                    jnp.where(emit | case_go, False,
                                              s["no12"]))
        if one_row:
            out["pend"] = jnp.where(defer, True,
                                    jnp.where(pending, False, pend))
            out["t2p"] = jnp.where(defer, t2, s["t2p"])
        if count_steps:
            out["steps"] = s["steps"] + active.astype(jnp.int32)
        return out

    def body(s):
        for _ in range(unroll):
            s = step(s)
        return s

    # ---------------- segmented lockstep compaction ----------------
    # Every per-step gather costs ~rows regardless of which lanes still
    # need it, and the step-count distribution is wide (mean/max ~0.57 on
    # 150 bp reads: half the lanes finish by ~45% of max steps). Each
    # segment (iters, W2) runs `iters` unrolled while_loop iterations at
    # the current width, then -- IF the survivors fit -- compacts them
    # into a W2-wide state (monotone searchsorted + gather; scatter-free)
    # and continues narrow; the fit check is a lax.cond, so an unlucky
    # batch just keeps the old width (no wrong-capacity cliff). Results
    # merge back with one row gather per level. Per-lane trajectories are
    # untouched: lanes are independent, so running them at a different
    # width is bit-identical.
    merge_keys = ("h_all", "nhits", "sums") + (
        ("steps",) if count_steps else ())

    def run_to_done(s, stepfn):
        def b(st):
            for _ in range(unroll):
                st = stepfn(st)
            return st
        return jax.lax.while_loop(
            lambda st: jnp.any(~st["done"]), b, s)

    def run_capped(s, stepfn, iters):
        def c(carry):
            return jnp.any(~carry[0]["done"]) & (carry[1] < iters)

        def b(carry):
            st, it = carry
            for _ in range(unroll):
                st = stepfn(st)
            return (st, it + 1)
        s, _ = jax.lax.while_loop(c, b, (s, jnp.int32(0)))
        return s

    def run_level(s, rw, rnw, nlen, segs):
        W = s["done"].shape[0]

        def stepfn(st):
            return step(st, rw=rw, rnw=rnw, nlen=nlen)

        segs = tuple((it, w2) for it, w2 in segs if w2 < W)
        if not segs:
            return run_to_done(s, stepfn)
        iters, W2 = segs[0]
        s = run_capped(s, stepfn, iters)
        act = ~s["done"]
        cs = jnp.cumsum(act.astype(jnp.int32))
        nact = cs[-1]

        def with_compact(s):
            src = jnp.searchsorted(
                cs, jnp.arange(1, W2 + 1, dtype=jnp.int32))
            srcc = jnp.clip(src, 0, W - 1).astype(jnp.int32)
            valid = jnp.arange(W2, dtype=jnp.int32) < nact
            s2 = {k: v[srcc] for k, v in s.items()}
            s2["done"] = s2["done"] | ~valid
            s2 = run_level(s2, rw[srcc], rnw[srcc], nlen[srcc], segs[1:])
            # lane i (active at the split) finished in child slot cs[i]-1
            rank = jnp.clip(cs - 1, 0, W2 - 1)
            out = dict(s)
            for k in merge_keys:
                child = s2[k][rank]
                m = act.reshape((W,) + (1,) * (s[k].ndim - 1))
                out[k] = jnp.where(m, child, s[k])
            out["done"] = jnp.ones_like(s["done"])
            return out

        def without_compact(s):
            return run_level(s, rw, rnw, nlen, segs[1:])

        return jax.lax.cond(nact <= W2, with_compact, without_compact, s)

    if segments and use_words:
        out = run_level(state, rwords, rnwords, lengths, tuple(segments))
    else:
        out = jax.lax.while_loop(cond, body, state)
    h = out["h_all"]
    res = (h[:, :, 0], h[:, :, 1], h[:, :, 2], h[:, :, 3],
           out["nhits"], out["sums"])
    if count_steps:
        return res + (out["steps"],)
    return res


def direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff,
                   nblk: int = None, nblk12: int = None) -> FMKernels:
    """Single-device kernel set: plain gathers into replicated arrays.

    When `nblk` is given, fm_blocks is the unified table (blocks + packed
    ftab rows, ops/fm_jax.DeviceFMIndex.ufm) and the hot step uses ONE
    one-row-per-lane fused gather (fused_step_lookup1)."""
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
        from ..ops.fm_jax import _fchr_select
        lf = _fchr_select(fm_fchr, ch2) + r
        word = data[jnp.arange(B), word_off + (within[:B] >> 4)]
        topchar = ((word >> (2 * (within[:B] & 15).astype(jnp.uint32))) & 3
                   ).astype(jnp.int32)
        return lf[:B], lf[B:], topchar

    step_lookup1 = None
    if nblk is not None:
        def step_lookup1(starting, pending, fi, top, bot, chars,
                         use12=None, fi12=None):
            return fused_step_lookup1(fm_blocks, nblk, fm_fchr, zoff,
                                      starting, pending, fi, top, bot,
                                      chars, nblk12=nblk12 or 0,
                                      use12=use12, fi12=fi12)

    return FMKernels(
        ftab_lookup=ftab_lookup,
        lf_pair=lf_pair,
        lf=lambda rows, chars: lf_kernel(fm_blocks, fm_fchr, zoff, rows, chars),
        bwt_char=lambda rows: bwt_char_kernel(fm_blocks, rows),
        zoff=zoff,
        num_ftab=fm_ftab_tb.shape[0],
        row_dtype=fm_ftab_tb.dtype,
        step_lookup1=step_lookup1,
        deep=bool(nblk12),
    )


@functools.partial(jax.jit, static_argnames=("min_hitlen", "increment",
                                             "max_hits", "first_hit_only",
                                             "nblk", "packed_input",
                                             "nblk12"))
def batched_search(fm_blocks, fm_fchr, fm_ftab_tb, zoff,
                   rseq, lengths, start_cur,
                   min_hitlen: int, increment: int, max_hits: int,
                   first_hit_only: bool, nblk: int = None,
                   packed_input: bool = False, nblk12: int = None):
    """Single-chip full scan over all lanes (see search_loop)."""
    kern = direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff, nblk,
                          nblk12)
    rs = _unpack_transport(rseq, packed_input)
    return search_loop(kern, rs, lengths, start_cur,
                       min_hitlen, increment, max_hits, first_hit_only)


def _pack_search_outputs(h_top, h_bot, h_off, h_len, nhits, sums, idt,
                         compact: int):
    """Pack the 6 per-lane outputs into one array for a single fetch.

    compact=1 (narrow path, reads < 16 kbp): off/len and nhits/sums
    pairs share an int32 word -> (L, 3*mh+1) int32, ~25% fewer bytes
    over a bandwidth-limited tunnel download.
    compact=2 (wide path, bwt_len < 2^36, mh%4==0): int64 rows split
    into 32-bit low words + packed 4-bit high nibbles, biased +1 so the
    -1 empty sentinel round-trips -> (L, 3*mh + mh/4 + 1) int32, ~2.4x
    fewer bytes than the plain int64 dump.
    compact=3/4 (narrow/wide hit pool): only occupied slots cross the
    link (_pack_pool_outputs).
    Otherwise (L, 4*mh+2) in the row dtype."""
    if compact in (3, 4, 5, 6):
        return _pack_pool_outputs(h_top, h_bot, h_off, h_len, nhits, sums,
                                  POOL_SLOTS_PER_LANE * h_top.shape[0],
                                  mode=compact)
    if compact == 1:
        offlen = ((h_off.astype(jnp.int32) << 16)
                  | h_len.astype(jnp.int32))
        ns = ((nhits << 16) | sums).astype(jnp.int32)
        return jnp.concatenate(
            [h_top.astype(jnp.int32), h_bot.astype(jnp.int32), offlen,
             ns[:, None]], axis=1)
    if compact == 2:
        import jax.lax as lax
        L, mh = h_top.shape
        tp = (h_top + 1).astype(jnp.uint64)
        bp = (h_bot + 1).astype(jnp.uint64)
        t_lo = lax.bitcast_convert_type(
            (tp & 0xFFFFFFFF).astype(jnp.uint32), jnp.int32)
        b_lo = lax.bitcast_convert_type(
            (bp & 0xFFFFFFFF).astype(jnp.uint32), jnp.int32)
        nib = ((tp >> 32) | ((bp >> 32) << 4)).astype(jnp.uint32)
        n4 = nib.reshape(L, mh // 4, 4)
        nwords = lax.bitcast_convert_type(
            n4[:, :, 0] | (n4[:, :, 1] << 8) | (n4[:, :, 2] << 16)
            | (n4[:, :, 3] << 24), jnp.int32)
        offlen = ((h_off << 16) | h_len).astype(jnp.int32)
        ns = ((nhits << 16) | sums).astype(jnp.int32)
        return jnp.concatenate(
            [t_lo, b_lo, offlen, nwords, ns[:, None]], axis=1)
    return jnp.concatenate(
        [h_top, h_bot, h_off, h_len,
         nhits.astype(idt)[:, None], sums.astype(idt)[:, None]], axis=1)


POOL_SLOTS_PER_LANE = 8    # hit-pool budget. The pool is GLOBAL across
                           # lanes (a dense prefix), so it needs to cover
                           # the batch MEAN (~7.1 hits/lane measured),
                           # not the per-lane max; the download link is
                           # the e2e bottleneck and each slot costs 8 B.
                           # Overflow lanes are re-fetched exactly.


def _pack_pool_outputs(h_top, h_bot, h_off, h_len, nhits, sums, budget,
                       mode: int):
    """Dense hit-pool transport: only occupied hit slots cross the link.

    The fixed (L, max_hits) buffers are ~55% empty on real workloads, and
    the device->host link is the e2e bottleneck (tunnel ~17 MB/s), so the
    device compacts hits into a (budget, words) pool with a monotone
    searchsorted+gather (scatter-free). Layouts per hit:
      mode 3 (narrow): [top, bot, off<<16|len] int32
      mode 4 (wide, bwt_len+1 < 2^36): mode 3 low words + packed 4-bit
        high words for 4 consecutive pool slots
      mode 5 (narrow, reads <= 256 bp): [top, size<<18|off<<9|len] --
        8 B/hit; sizes >= 2^14-1 saturate, which the host detects and
        serves through the overflow re-fetch (exact, just slower)
      mode 6 (wide, reads <= 256 bp, bwt_len+1 < 2^36): mode 5's two
        words + packed 4-bit top high nibbles for 8 consecutive pool
        slots -- 8.5 B/hit vs mode 4's 13
    Tail: (L,) int32 nhits<<16|sums. Lanes whose hits fall beyond
    `budget` are detected host-side from the tail counts and re-fetched
    (engine._handle_overflow), so truncation is a fallback, never a
    semantic change.
    """
    import jax.lax as lax
    L, mh = h_top.shape
    nh = jnp.minimum(nhits, mh)
    cum = jnp.cumsum(nh)
    j = jnp.arange(budget, dtype=jnp.int32)
    lane = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    lane_c = jnp.minimum(lane, L - 1)
    slot = j - (cum[lane_c] - nh[lane_c])
    valid = lane < L
    flat = lane_c * mh + jnp.clip(slot, 0, mh - 1)
    top = jnp.where(valid, h_top.reshape(-1)[flat], jnp.asarray(-1, h_top.dtype))
    bot = jnp.where(valid, h_bot.reshape(-1)[flat], jnp.asarray(-1, h_top.dtype))
    off = jnp.where(valid, h_off.reshape(-1)[flat], 0).astype(jnp.int32)
    ln = jnp.where(valid, h_len.reshape(-1)[flat], 0).astype(jnp.int32)
    tail = ((nhits << 16) | sums).astype(jnp.int32)
    if mode == 5:
        size = jnp.where(top >= 0, jnp.minimum(bot - top, 16383),
                         0).astype(jnp.int32)
        word2 = (size << 18) | (off << 9) | ln
        pool = jnp.stack([top.astype(jnp.int32), word2],
                         axis=1).reshape(-1)
        return jnp.concatenate([pool, tail])
    if mode == 6:
        size = jnp.where(top >= 0, jnp.minimum(bot - top, 16383),
                         0).astype(jnp.int32)
        word2 = (size << 18) | (off << 9) | ln
        tp = (top + 1).astype(jnp.uint64)     # bias: -1 sentinel -> 0
        t_lo = lax.bitcast_convert_type(
            (tp & 0xFFFFFFFF).astype(jnp.uint32), jnp.int32)
        pool = jnp.stack([t_lo, word2], axis=1).reshape(-1)
        nib = (tp >> 32).astype(jnp.uint32)
        n8 = nib.reshape(budget // 8, 8)
        packed_hi = n8[:, 0]
        for k in range(1, 8):
            packed_hi = packed_hi | (n8[:, k] << (4 * k))
        nwords = lax.bitcast_convert_type(packed_hi, jnp.int32)
        return jnp.concatenate([pool, nwords, tail])
    offlen = (off << 16) | ln
    if mode == 3:
        pool = jnp.stack([top.astype(jnp.int32), bot.astype(jnp.int32),
                          offlen], axis=1).reshape(-1)
        return jnp.concatenate([pool, tail])
    tp = (top + 1).astype(jnp.uint64)
    bp = (bot + 1).astype(jnp.uint64)
    t_lo = lax.bitcast_convert_type((tp & 0xFFFFFFFF).astype(jnp.uint32),
                                    jnp.int32)
    b_lo = lax.bitcast_convert_type((bp & 0xFFFFFFFF).astype(jnp.uint32),
                                    jnp.int32)
    nib = ((tp >> 32) | ((bp >> 32) << 4)).astype(jnp.uint32)
    n4 = nib.reshape(budget // 4, 4)
    nwords = lax.bitcast_convert_type(
        n4[:, 0] | (n4[:, 1] << 8) | (n4[:, 2] << 16) | (n4[:, 3] << 24),
        jnp.int32)
    pool = jnp.stack([t_lo, b_lo, offlen], axis=1).reshape(-1)
    return jnp.concatenate([pool, nwords, tail])


def _unpack_pool_outputs(packed: np.ndarray, L: int, mh: int, budget: int,
                         mode: int):
    """Host inverse of _pack_pool_outputs -> the usual 6 (L, mh) arrays.

    Lanes truncated by the pool budget (or carrying a mode-5 saturated
    size) get nhits poisoned past mh so the standard overflow re-run
    serves them exactly.
    """
    words = 2 if mode in (5, 6) else 3
    pool = packed[:budget * words].reshape(budget, words)
    tail = packed[-L:]
    nhits = ((tail >> 16) & 0xFFFF).astype(np.int32)
    sums = (tail & 0xFFFF).astype(np.int32)
    nh = np.minimum(nhits, mh)
    cum = np.cumsum(nh)
    doffs = cum - nh
    total = int(cum[-1]) if L else 0
    dt = np.int64 if mode in (4, 6) else np.int32
    h_top = np.full((L, mh), -1, dt)
    h_bot = np.full((L, mh), -1, dt)
    h_off = np.zeros((L, mh), np.int32)
    h_len = np.zeros((L, mh), np.int32)
    ncov = min(total, budget)
    if ncov:
        lanes = np.repeat(np.arange(L, dtype=np.int64), nh)[:ncov]
        slots = (np.arange(ncov, dtype=np.int64) - doffs[lanes])
        if mode == 4:
            t_lo = np.ascontiguousarray(pool[:ncov, 0]).view(np.uint32)
            b_lo = np.ascontiguousarray(pool[:ncov, 1]).view(np.uint32)
            nib = np.ascontiguousarray(
                packed[budget * 3: budget * 3 + budget // 4]).view(
                    np.uint8)[:ncov]
            top = ((nib.astype(np.int64) & 15) << 32 | t_lo) - 1
            bot = ((nib.astype(np.int64) >> 4) << 32 | b_lo) - 1
        elif mode == 6:
            t_lo = np.ascontiguousarray(pool[:ncov, 0]).view(np.uint32)
            nib = np.ascontiguousarray(
                packed[budget * 2: budget * 2 + budget // 8]).view(
                    np.uint8)
            hi4 = ((nib[(np.arange(ncov)) >> 1].astype(np.int64)
                    >> ((np.arange(ncov) & 1) * 4)) & 15)
            top = ((hi4 << 32) | t_lo) - 1
            w2 = np.ascontiguousarray(pool[:ncov, 1]).view(np.uint32)
            size = (w2 >> 18).astype(np.int64)
            bot = np.where(top >= 0, top + size, -1)
            sat = size == 16383
            if sat.any():
                bad = np.zeros(L, bool)
                bad[lanes[sat]] = True
                nhits = np.where(bad, np.maximum(nhits, mh + 1),
                                 nhits).astype(np.int32)
            h_off[lanes, slots] = (w2 >> 9) & 511
            h_len[lanes, slots] = w2 & 511
        else:
            top = pool[:ncov, 0]
            if mode == 5:
                w2 = np.ascontiguousarray(pool[:ncov, 1]).view(np.uint32)
                size = (w2 >> 18).astype(np.int32)
                bot = np.where(top >= 0, top + size, -1)
                sat = size == 16383
                if sat.any():
                    # exact sizes live beyond 14 bits: re-fetch the lane
                    bad = np.zeros(L, bool)
                    bad[lanes[sat]] = True
                    nhits = np.where(bad, np.maximum(nhits, mh + 1),
                                     nhits).astype(np.int32)
                h_off[lanes, slots] = (w2 >> 9) & 511
                h_len[lanes, slots] = w2 & 511
            else:
                bot = pool[:ncov, 1]
        h_top[lanes, slots] = top
        h_bot[lanes, slots] = bot
        if mode not in (5, 6):
            h_off[lanes, slots] = (pool[:ncov, 2] >> 16) & 0xFFFF
            h_len[lanes, slots] = pool[:ncov, 2] & 0xFFFF
    if total > budget:
        # hits beyond the pool: force the overflow path for those lanes
        trunc = doffs + nh > budget
        nhits = np.where(trunc, np.maximum(nhits, mh + 1),
                         nhits).astype(np.int32)
    return [h_top, h_bot, h_off, h_len, nhits, sums]


def _unpack_search_outputs(packed: np.ndarray, mh: int, compact: int):
    """Host-side inverse of _pack_search_outputs."""
    m = mh
    if compact == 1:
        ol = packed[:, 2 * m:3 * m]
        ns = packed[:, 3 * m]
        return [packed[:, :m], packed[:, m:2 * m],
                (ol >> 16) & 0xFFFF, ol & 0xFFFF,
                (ns >> 16) & 0xFFFF, ns & 0xFFFF]
    if compact == 2:
        L = packed.shape[0]
        t_lo = np.ascontiguousarray(packed[:, :m]).view(np.uint32)
        b_lo = np.ascontiguousarray(packed[:, m:2 * m]).view(np.uint32)
        ol = packed[:, 2 * m:3 * m]
        nib = np.ascontiguousarray(
            packed[:, 3 * m:3 * m + m // 4]).view(np.uint8).reshape(L, m)
        ns = packed[:, 3 * m + m // 4]
        top = ((nib.astype(np.int64) & 15) << 32 | t_lo) - 1
        bot = ((nib.astype(np.int64) >> 4) << 32 | b_lo) - 1
        return [top, bot,
                (ol >> 16) & 0xFFFF, ol & 0xFFFF,
                (ns >> 16) & 0xFFFF, ns & 0xFFFF]
    return [packed[:, :m], packed[:, m:2 * m], packed[:, 2 * m:3 * m],
            packed[:, 3 * m:4 * m], packed[:, 4 * m], packed[:, 4 * m + 1]]


@functools.partial(jax.jit, static_argnames=("min_hitlen", "increment",
                                             "max_hits", "first_hit_only",
                                             "nblk", "compact",
                                             "packed_input", "segments",
                                             "nblk12"))
def batched_search_packed(fm_blocks, fm_fchr, fm_ftab_tb, zoff,
                          rseq, lengths, start_cur,
                          min_hitlen: int, increment: int, max_hits: int,
                          first_hit_only: bool, nblk: int = None,
                          compact: bool = False,
                          packed_input: bool = False,
                          segments: tuple = (), nblk12: int = None):
    """As batched_search, but packs all outputs into ONE array on device
    (see _pack_search_outputs). A single small device->host transfer
    matters when the device sits behind a network tunnel."""
    kern = direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff, nblk,
                          nblk12)
    rs = _unpack_transport(rseq, packed_input)
    h_top, h_bot, h_off, h_len, nhits, sums = search_loop(
        kern, rs, lengths, start_cur, min_hitlen,
        increment, max_hits, first_hit_only, segments=segments)
    return _pack_search_outputs(h_top, h_bot, h_off, h_len, nhits, sums,
                                kern.row_dtype, compact)


PRESOLVE_ROWS_PER_MATE = 4   # compacted walk budget (mean need ~2-4)


def _presolve_pick_rows(h_top, h_bot, h_len, khits: int, ihits: int,
                        min_hitlen: int, rk: int, idt):
    """Predict, per mate, which SA rows the classifier will resolve.

    Lanes (2m, 2m+1) are one mate's fw/rc strands (dispatch order).
    Mirrors classify_with_states' resolution pass (classifier.h:429-479):
    choose_strand, hit ordering (approximate compareBWTHits), the
    max_genome_hit_size budget and its cumulative cap. Approximations are
    safe: the host consumes values through a row-keyed cache, so any
    mispredicted row is just a cache miss served by a fallback batch.

    Returns (rows (M, rk) in row dtype, per-mate row counts (M,));
    unused slots hold 0 (row 0 resolves to a real value, so duplicates
    are harmless).
    """
    L, mh = h_top.shape
    M = L // 2
    t = h_top.reshape(M, 2, mh)
    b = h_bot.reshape(M, 2, mh)
    ln = h_len.reshape(M, 2, mh).astype(jnp.int32)
    size = jnp.where(t >= 0, b - t, 0)

    # per-strand score/maxlen over hits with len >= min_hitlen
    scoring = (ln >= min_hitlen) & (size != 0)
    sc = jnp.where(scoring, (ln - 15) * (ln - 15), 0).sum(
        axis=2, dtype=jnp.int32)                      # (M, 2)
    mx = jnp.where(scoring, ln, 0).max(axis=2)        # (M, 2)
    fw_better = (sc[:, 0] > sc[:, 1]) | (
        (sc[:, 0] == sc[:, 1]) & (mx[:, 0] > mx[:, 1]))
    rc_better = (sc[:, 1] > sc[:, 0]) | (
        (sc[:, 0] == sc[:, 1]) & (mx[:, 1] > mx[:, 0]))
    both = ~fw_better & ~rc_better
    use = jnp.stack([fw_better | both, rc_better | both], axis=1)  # (M,2)

    # max_genome_hit_size: khits, grown by the largest chosen-strand
    # range (the reference adds khits once per strand pass; adding it
    # for both passes over-provisions, which only costs budget)
    big = jnp.where(scoring & use[:, :, None], size, 0)
    maxsz = big.max(axis=(1, 2))
    nstr = use.sum(axis=1, dtype=jnp.int32)
    mghs = jnp.where(maxsz > khits,
                     maxsz + nstr.astype(maxsz.dtype) * khits, khits)

    # resolution gate per hit (strict > min_hitlen; classifier.h:451)
    gate = (ln > min_hitlen) & (size != 0) & use[:, :, None]
    nelt = jnp.minimum(size, mghs[:, None, None])
    gate = gate & (nelt <= ihits)

    # order hits: fw strand block then rc (the reference's strand loop),
    # each sorted by (size asc, len desc) ~= compareBWTHits; size clamped
    # so the packed key cannot overflow int32 on the narrow path
    sentinel = jnp.iinfo(size.dtype).max
    key = jnp.where(gate, jnp.minimum(size, 1 << 18) * 4096 - ln, sentinel)
    key = key.reshape(M, 2 * mh)
    tops_f = t.reshape(M, 2 * mh)
    nelt_f = jnp.where(gate, nelt, 0).reshape(M, 2 * mh)
    key, tops_f, nelt_f = jax.lax.sort(
        (key, tops_f, nelt_f), dimension=1, num_keys=1)

    # cumulative budget: hit i taken while previous taken nelts < mghs
    cum = jnp.cumsum(nelt_f, axis=1)
    prev = cum - nelt_f
    take = (nelt_f > 0) & (prev < mghs[:, None])
    nelt_t = jnp.where(take, nelt_f, 0)
    start = jnp.cumsum(nelt_t, axis=1) - nelt_t       # slot offsets

    # scatter hit row-ranges into the rk slots (masked sum over hits)
    slots = jnp.arange(rk, dtype=jnp.int32)[None, :, None]   # (1, rk, 1)
    s3 = start[:, None, :]                                    # (M, 1, 2mh)
    n3 = nelt_t[:, None, :]
    in_range = (slots >= s3) & (slots < s3 + n3)
    off = (slots - s3).astype(idt)
    rows = jnp.where(in_range, tops_f[:, None, :] + off, 0).sum(
        axis=2, dtype=idt)                                    # (M, rk)
    nrows = jnp.minimum(jnp.cumsum(nelt_t, axis=1)[:, -1],
                        rk).astype(jnp.int32)                 # per-mate count
    return rows, nrows


@functools.partial(jax.jit, static_argnames=(
    "min_hitlen", "increment", "max_hits", "nblk", "khits", "ihits", "rk",
    "sample_mask", "offrate", "has_bounds", "narrow", "max_steps",
    "compact", "packed_input", "phase1_steps", "segments", "nblk12"))
def batched_search_presolve(fm_blocks, fm_fchr, fm_ftab_tb, zoff,
                            offs, boundary_rows, boundary_refs,
                            rseq, lengths, start_cur,
                            min_hitlen: int, increment: int, max_hits: int,
                            nblk: int, khits: int, ihits: int, rk: int,
                            sample_mask: int, offrate: int,
                            has_bounds: bool, narrow: bool, max_steps: int,
                            compact: bool = False,
                            packed_input: bool = False,
                            phase1_steps: int = None,
                            segments: tuple = (), nblk12: int = None):
    """Search + speculative SA resolution in ONE dispatch.

    Besides the packed hit buffers, returns the predicted rows and their
    resolved sequence indexes, so in the common case the host never has
    to come back to the device for resolution (the round trip matters:
    each dispatch has ~50 ms latency on a tunneled device)."""
    from ..ops.fm_jax import resolve_rows_core, resolve_rows_two_phase
    kern = direct_kernels(fm_blocks, fm_fchr, fm_ftab_tb, zoff, nblk,
                          nblk12)
    rs = _unpack_transport(rseq, packed_input)
    h_top, h_bot, h_off, h_len, nhits, sums = search_loop(
        kern, rs, lengths, start_cur, min_hitlen,
        increment, max_hits, first_hit_only=False, segments=segments)
    idt = kern.row_dtype
    rows, nrows = _presolve_pick_rows(h_top, h_bot, h_len, khits, ihits,
                                      min_hitlen, rk, idt)
    # compact the per-mate row lists (mean occupancy ~2-4 of rk slots)
    # into an R-row budget before the LF walk: the walk is the dominant
    # presolve cost and is linear in row count. The monotone compaction
    # is a searchsorted + gather (a scatter would serialize on TPU).
    M = rows.shape[0]
    R = PRESOLVE_ROWS_PER_MATE * M
    doffs = jnp.cumsum(nrows) - nrows
    j = jnp.arange(R, dtype=jnp.int32)
    mate = jnp.searchsorted(doffs, j, side="right").astype(jnp.int32) - 1
    slot = j - doffs[mate]
    valid = slot < nrows[mate]
    src = mate * rk + jnp.clip(slot, 0, rk - 1)
    flat = jnp.where(valid, rows.reshape(-1)[src], 0)
    # (a dense hit-compaction transfer was tried here and reverted: the
    # searchsorted+gather compaction cost more device time than the
    # ~2 MB it saved at the tunnel's ~17 MB/s download rate)
    packed = _pack_search_outputs(h_top, h_bot, h_off, h_len, nhits,
                                  sums, idt, compact)
    if phase1_steps is not None:
        # multi-GB tables: the lockstep walk tail is HBM-latency-bound,
        # so survivors after phase1_steps compact to 1/8 width and only
        # they pay the tail (ops/fm_jax.resolve_rows_two_phase)
        k1, t1, k2, t2 = resolve_rows_two_phase(
            fm_blocks, fm_fchr, offs, boundary_rows, boundary_refs, zoff,
            flat, sample_mask, offrate, has_bounds, narrow, max_steps,
            phase1_steps=phase1_steps)
        return packed, k1, t1, k2, t2
    tidx = resolve_rows_core(
        fm_blocks, fm_fchr, offs, boundary_rows, boundary_refs, zoff,
        flat, sample_mask, offrate, has_bounds, narrow, max_steps)
    return packed, flat, tidx


def _start_host_copy(*arrays) -> None:
    """Begin async device->host copies so the download overlaps with
    whatever the host does before blocking on the result."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except Exception:
            return


def _bucket(n: int, lo: int = 256) -> int:
    """Round up to a power of two (>= lo) so repeated batches hit the
    jit cache instead of recompiling per shape."""
    b = lo
    while b < n:
        b <<= 1
    return b


def _bucket_len(n: int, lo: int = 32) -> int:
    """Read-length bucket: multiples of 32 up to 512, then powers of two.

    Real FASTQ batches have near-uniform read lengths, so the finer bands
    stay on one compiled shape while cutting the padded upload bytes and
    the per-step masked-sum width by ~40% vs the power-of-two bucket
    (150 bp reads ride a 160-wide lane matrix instead of 256)."""
    m = max(n, lo)
    if m <= 512:
        return (m + 31) // 32 * 32
    return _bucket(m, lo=512)


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
        # floors for the lane-count / read-length jit buckets; raising
        # them lets differently sized batches share ONE compiled shape
        # (compiles through the tunnel cost 60-200 s and there is no
        # persistent cache)
        self.lane_bucket_lo = 256
        self.lmax_lo = 32
        # cumulative transfer/extension counters (PerfMetrics surface)
        self.stats = {"upload_bytes": 0, "download_bytes": 0,
                      "ext_searches": 0, "ext_lanes": 0}
        # serializes ALL jax interactions when the pipeline's tail-thread
        # overlap is on: the axon tunnel deadlocks under *concurrent*
        # jax calls from two threads, but strictly serialized cross-
        # thread calls are safe. Main thread holds it for dispatch/
        # collect; the tail worker takes it for the (rare) extension
        # searches. RLock: search_collect's overflow re-run nests _run.
        self.dev_lock = threading.RLock()
        # tables above this block count get the two-phase resolve walk
        # (lockstep tail is HBM-latency-bound on multi-GB tables)
        self.presolve_phase1_nblk = 1 << 16
        # one-row-per-lane fused step (fused_step_lookup1); env toggle
        # exists for A/B ablation (CENTRIFUGE_TPU_ONE_ROW=0 -> classic
        # multi-gather step), perf numbers in CLAUDE.md's cost model
        self.one_row = os.environ.get(
            "CENTRIFUGE_TPU_ONE_ROW", "1").lower() not in (
            "0", "off", "false", "no")
        # dense hit-pool transport kicks in at this lane count (the
        # compaction gather isn't worth it for tiny batches)
        self.pool_min_lanes = 1024
        # lockstep compaction kicks in at this lane count (below it the
        # extra while_loop compiles cost more than the saved gathers)
        self.segment_min_lanes = 4096

    def pack(self, seqs: List[np.ndarray], lmax: int,
             nlanes: int) -> Tuple[np.ndarray, np.ndarray]:
        """Reversed, padded lane matrix as int8 (codes fit a byte and the
        host->device tunnel upload is bandwidth-bound, so 1/4 the bytes of
        int32; the jitted entry casts on device)."""
        fc = self.fm.ftab_chars
        rseq = np.zeros((nlanes, lmax + fc), dtype=np.int8)
        lengths = np.zeros(nlanes, dtype=np.int32)
        if seqs:
            lens = np.fromiter((len(x) for x in seqs), np.int32, len(seqs))
            lengths[: len(seqs)] = lens
            total = int(lens.sum())
            if total:
                allseq = np.concatenate(seqs)
                rows = np.repeat(np.arange(len(seqs), dtype=np.int64), lens)
                starts = np.cumsum(lens) - lens
                col = np.arange(total, dtype=np.int64) - starts[rows]
                rseq[rows, lens[rows] - 1 - col] = allseq
        return rseq, lengths

    def _compact_ok(self, lmax: int, mh: int = 16, pool: bool = False) -> int:
        # the compact output packing needs off/len/nhits/sums to fit
        # 16-bit fields (mode 1, int32 rows) -- or, on the wide path,
        # rows+1 to fit 36 bits with mh divisible by 4 (mode 2).
        # pool=True requests the dense hit-pool transport (modes 3/4):
        # the (L, mh) buffers are ~55% empty on real workloads and the
        # download link is the bottleneck.
        if lmax >= 16384:
            return 0
        if not self.fm.wide:
            if pool:
                # 8 B/hit when off/len fit 9 bits (reads <= ~256 bp)
                return 5 if lmax <= 266 else 3
            return 1
        if self.fm.bwt_len + 1 >= (1 << 36):
            return 0
        if pool:
            # 8.5 B/hit when off/len fit 9 bits (reads <= ~256 bp)
            return 6 if lmax <= 266 else 4
        return 2 if mh % 4 == 0 else 0

    def _segments(self, nlanes: int, maxlen: int) -> tuple:
        """Lockstep-compaction schedule for the search while_loop.

        Measured survivor curve (150 bp sim reads): half the lanes finish
        by ~45% of the max step count, a quarter run to the very end. So
        run ~0.55*maxlen steps full-width, then compact survivors to half
        width (search_loop handles the capacity check + merge). maxlen is
        quantized to 32-position bands so the static schedule doesn't add
        jit shapes beyond what the lmax bucket already creates."""
        if nlanes < self.segment_min_lanes:
            return ()
        m = ((maxlen + 31) // 32) * 32
        # measured survivor curve is a CLIFF, not a slope: the fast
        # strand of each read finishes by ~0.32*len steps (junk strands
        # restart every ~10 chars), the slow strand runs to ~0.95*len.
        # Split just past the cliff; capacity 9/16 (not 1/2) so batches
        # where slightly more than half the lanes are slow (palindromic/
        # both-strand hits) still take the compact branch. A second
        # level at ~0.62*len catches the remaining error-split
        # stragglers (round-3 curve: 50% active at 0.46*len, 25% at the
        # end); if a batch's survivors exceed a level's capacity the
        # lax.cond just keeps the current width, so levels are safe.
        it1 = max(2, int(round(0.32 * m / 8)))
        it2 = max(2, int(round(0.30 * m / 8)))
        w2 = ((nlanes * 9 // 16) + 255) // 256 * 256
        w3 = ((nlanes * 6 // 16) + 255) // 256 * 256
        return ((it1, w2), (it2, w3))

    @staticmethod
    def transport(rseq: np.ndarray) -> np.ndarray:
        """2 base codes per byte for the host->device upload (codes are
        0-4, so 4 bits each); the jitted entry unpacks (_unpack_rseq)."""
        return (((rseq[:, 0::2].astype(np.uint8)) & 15)
                | (rseq[:, 1::2].astype(np.uint8) << 4))

    def pack_transport(self, seqs: List[np.ndarray], lmax: int,
                       nlanes: int) -> Tuple[np.ndarray, np.ndarray]:
        """Transport-packed lane matrix straight from the read codes.

        The native packer (native/pack.cpp) fuses the reversed-lane
        scatter and the 2-codes-per-byte packing in one threaded pass
        (~2 ms vs ~60 ms for the numpy pack+transport pair at 16k
        lanes); numpy remains the fallback."""
        fc = self.fm.ftab_chars
        row_bytes = (lmax + fc + 1) // 2
        lengths = np.zeros(nlanes, dtype=np.int32)
        if seqs:
            from ..native.pack import pack_reads
            lens = np.fromiter((len(x) for x in seqs), np.int32, len(seqs))
            lengths[: len(seqs)] = lens
            packed = pack_reads(seqs, lens, nlanes, row_bytes)
            if packed is not None:
                return packed, lengths
        rseq, lengths = self.pack(seqs, lmax, nlanes)
        return self.transport(rseq), lengths

    def pack_transport2(self, seqs: List[np.ndarray], lmax: int,
                        nlanes: int):
        """Like pack_transport, but tries the 2-bit (4 codes/byte)
        packing first: valid whenever the batch carries no N calls (the
        common case), halving the dominant host->device upload again.
        Returns (matrix, lengths, tmode) with tmode 2 (2-bit) or 1
        (4-bit fallback: Ns present or no native lib)."""
        fc = self.fm.ftab_chars
        if seqs:
            from ..native.pack import pack_reads2
            lens = np.fromiter((len(x) for x in seqs), np.int32, len(seqs))
            out = pack_reads2(seqs, lens, nlanes, (lmax + fc + 3) // 4)
            if out is not None and not out[1]:
                lengths = np.zeros(nlanes, dtype=np.int32)
                lengths[: len(seqs)] = lens
                return out[0], lengths, 2
        rseqp, lengths = self.pack_transport(seqs, lmax, nlanes)
        return rseqp, lengths, 1

    def _run(self, rseqp, lengths, start, max_hits, first_hit_only,
             pool: bool = False, tmode: int = 1):
        """rseqp: transport-packed lane matrix (pack_transport[2])."""
        nlanes = rseqp.shape[0]
        plen = rseqp.shape[1] * (2 if tmode == 1 else 4)
        compact = self._compact_ok(plen, max_hits,
                                   pool=pool and nlanes >= self.pool_min_lanes)
        self.stats["upload_bytes"] += rseqp.nbytes + lengths.nbytes
        with self.dev_lock:
            packed = np.asarray(batched_search_packed(
                self.fm.blocks, self.fm.fchr, self.fm.ftab_tb,
                jnp.asarray(self.fm.zoff, self.fm.row_dtype),
                jnp.asarray(rseqp), jnp.asarray(lengths),
                jnp.asarray(start), min_hitlen=self.min_hitlen,
                increment=self.increment, max_hits=max_hits,
                first_hit_only=first_hit_only,
                nblk=self.fm.nblk if self.one_row else None,
                compact=compact, packed_input=tmode,
                nblk12=(self.fm.nblk12 or None) if self.one_row else None))
        self.stats["download_bytes"] += packed.nbytes
        if compact in (3, 4, 5, 6):
            return _unpack_pool_outputs(
                packed, nlanes, max_hits, POOL_SLOTS_PER_LANE * nlanes,
                mode=compact)
        return _unpack_search_outputs(packed, max_hits, compact)

    def search_async(self, seqs: List[np.ndarray], presolve: bool = False,
                     khits: int = 5, ihits: int = 200):
        """Dispatch the device search without blocking; returns a handle
        for search_collect. jax execution is async, so the device starts
        working while the host moves on.

        With presolve=True the same dispatch also speculatively resolves
        the SA rows the assignment pass is predicted to request
        (batched_search_presolve); search_collect then returns the
        (rows, tidx) prefetch arrays as a 7th element."""
        L = len(seqs)
        maxlen = max((len(s) for s in seqs), default=1)
        lmax = _bucket_len(maxlen, lo=self.lmax_lo)
        nlanes = _bucket(L, lo=self.lane_bucket_lo)
        rseqp, lengths, tmode = self.pack_transport2(seqs, lmax, nlanes)
        start = np.zeros(nlanes, dtype=np.int32)
        mh = min(self.FIRST_MAX_HITS, lmax)
        segs = self._segments(nlanes, maxlen)
        with self.dev_lock:
            return self._search_async_locked(
                rseqp, lengths, start, mh, lmax, nlanes, maxlen, segs,
                presolve, khits, ihits, tmode)

    def _search_async_locked(self, rseqp, lengths, start, mh, lmax,
                             nlanes, maxlen, segs, presolve, khits,
                             ihits, tmode):
        common = (self.fm.blocks, self.fm.fchr, self.fm.ftab_tb,
                  jnp.asarray(self.fm.zoff, self.fm.row_dtype))
        compact = self._compact_ok(lmax + self.fm.ftab_chars, mh)
        if presolve:
            fm = self.fm
            rk = 16 if khits <= 5 else min(128, 4 * khits)
            # large tables (>= ~33 Mbp): two-phase resolve walk (the
            # lockstep tail is latency-bound there; see fm_jax)
            phase1 = 48 if fm.nblk > self.presolve_phase1_nblk else None
            out = batched_search_presolve(
                *common, fm.offs, fm.boundary_rows, fm.boundary_refs,
                jnp.asarray(rseqp), jnp.asarray(lengths),
                jnp.asarray(start),
                min_hitlen=self.min_hitlen, increment=self.increment,
                max_hits=mh, nblk=fm.nblk if self.one_row else None,
                khits=khits, ihits=ihits, rk=rk,
                nblk12=(fm.nblk12 or None) if self.one_row else None,
                sample_mask=(1 << fm.offrate) - 1, offrate=fm.offrate,
                has_bounds=fm.boundary_rows.shape[0] > 0,
                narrow=fm.npat <= 0xFFFF, max_steps=4096, compact=compact,
                packed_input=tmode, phase1_steps=phase1, segments=segs)
            packed, pre = out[0], out[1:]
            _start_host_copy(packed, *pre)
            self.stats["upload_bytes"] += rseqp.nbytes + lengths.nbytes
            self.stats["download_bytes"] += (packed.nbytes
                                             + sum(a.nbytes for a in pre))
            return (packed, rseqp, lengths, mh, lmax, nlanes, compact,
                    pre, tmode)
        compact = self._compact_ok(lmax + self.fm.ftab_chars, mh,
                                   pool=nlanes >= self.pool_min_lanes)
        packed = batched_search_packed(
            *common,
            jnp.asarray(rseqp), jnp.asarray(lengths),
            jnp.asarray(start), min_hitlen=self.min_hitlen,
            increment=self.increment, max_hits=mh, first_hit_only=False,
            nblk=self.fm.nblk if self.one_row else None,
            compact=compact, packed_input=tmode,
            segments=segs,
            nblk12=(self.fm.nblk12 or None) if self.one_row else None)
        _start_host_copy(packed)
        self.stats["upload_bytes"] += rseqp.nbytes + lengths.nbytes
        self.stats["download_bytes"] += packed.nbytes
        return (packed, rseqp, lengths, mh, lmax, nlanes, compact, None,
                tmode)

    def search_fetch(self, handle):
        """Block on the device transfer ONLY (the part that must hold
        dev_lock); returns a handle whose arrays are host numpy.
        Idempotent, so the overlap pipeline can fetch on the main thread
        and hand the (device-free) unpack to the tail worker."""
        (packed, rseqp, lengths, mh, lmax, nlanes, compact, pre,
         tmode) = handle
        if isinstance(packed, np.ndarray):
            return handle
        with self.dev_lock:
            packed = np.asarray(packed)
            pre = None if pre is None else [np.asarray(a) for a in pre]
        return (packed, rseqp, lengths, mh, lmax, nlanes, compact, pre,
                tmode)

    def search_collect(self, handle, L: int):
        """Block on a search_async handle; returns (arrays, prefetch):
        arrays = [h_top, h_bot, h_off, h_len, nhits, sums] per lane and
        prefetch = (rows_sorted, tidx_sorted) when the dispatch had
        presolve=True, else None."""
        (packed, rseqp, lengths, mh, lmax, nlanes, compact, pre,
         tmode) = self.search_fetch(handle)
        if compact in (3, 4, 5, 6):
            out = _unpack_pool_outputs(
                packed, nlanes, mh,
                POOL_SLOTS_PER_LANE * nlanes, mode=compact)
        else:
            out = _unpack_search_outputs(packed, mh, compact)
        out = self._handle_overflow(out, rseqp, lengths, mh, lmax,
                                    nlanes, tmode)
        out = [a[:L] for a in out]
        prefetch = None
        if pre is not None:
            if len(pre) == 2:
                prows = np.asarray(pre[0])
                ptidx = np.asarray(pre[1])
            else:
                # two-phase walk: phase-1 keys (+ -1 masks for rows the
                # phase didn't finish) plus the compacted phase-2 pairs;
                # -1 keys never match a real request -> fallback batch
                prows = np.concatenate([np.asarray(pre[0]),
                                        np.asarray(pre[2])])
                ptidx = np.concatenate([np.asarray(pre[1]),
                                        np.asarray(pre[3])])
            order = np.argsort(prows, kind="stable")
            prefetch = (prows[order], ptidx[order])
        return out, prefetch

    def search(self, seqs: List[np.ndarray]):
        """Full scan for each sequence; returns per-lane raw hit arrays."""
        L = len(seqs)
        lmax = _bucket_len(max((len(s) for s in seqs), default=1),
                           lo=self.lmax_lo)
        nlanes = _bucket(L, lo=self.lane_bucket_lo)
        rseqp, lengths, tmode = self.pack_transport2(seqs, lmax, nlanes)
        start = np.zeros(nlanes, dtype=np.int32)
        mh = min(self.FIRST_MAX_HITS, lmax)
        out = self._run(rseqp, lengths, start, mh, False, pool=True,
                        tmode=tmode)
        out = self._handle_overflow(out, rseqp, lengths, mh, lmax, nlanes,
                                    tmode)
        return [a[:L] for a in out]

    def _handle_overflow(self, out, rseqp, lengths, mh, lmax, nlanes,
                         tmode: int = 1):
        over = np.nonzero(out[4] > mh)[0]
        if over.shape[0]:
            # rare: a lane emitted more hits than the small buffer holds.
            # Re-run only those lanes, sized to the actual max hit count
            # (a full-lmax buffer would blow up both the one-hot update
            # here and the C++ tail's per-slot loops downstream).
            nover = _bucket(over.shape[0], lo=32)
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

    FIRST_HITS_CHUNK = 4096

    def search_first_hits(self, seqs: List[np.ndarray], offsets: np.ndarray):
        """One partialSearch per lane from the given offsets (extension pass).

        Lanes run in fixed-size chunks so the kernel compiles for exactly
        one shape regardless of how many extension misses a batch has."""
        L = len(seqs)
        lmax = _bucket_len(max((len(s) for s in seqs), default=1), lo=32)
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
