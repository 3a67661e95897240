"""Host-side FM resolve walk (ctypes wrapper for fmwalk.cpp).

Drop-in replacement for the device resolver from ops/fm_jax.make_resolver
on single-process runs: rows walk independently with per-row early exit
(mean ~2^offrate steps) instead of the device's lockstep max, and the
result needs no device round trip or prefetch download. The device
resolver remains authoritative for sharded/multi-host paths, and tests
compare the two for equality (tests/test_native.py).
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_LIB_FAILED = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        from .compile import build_native
        lib = C.CDLL(build_native(os.path.join(_HERE, "fmwalk.cpp"),
                                  extra_flags=("-pthread",)))
        lib.fm_resolve_rows.argtypes = [
            _u32p, C.c_int64, C.c_int32, _i64p, _i32p, C.c_int64,
            _i64p, _i32p, C.c_int64, C.c_int64, C.c_int64, C.c_int32,
            C.c_int32, C.c_int64, _i64p, _i32p, C.c_int64, C.c_int32,
            C.POINTER(C.c_int64)]
        lib.fm_first_hits.argtypes = [
            _u32p, C.c_int64, C.c_int32, _i64p, C.c_int64,
            _i64p, _i64p, C.c_int32,
            _u8p, _i64p, _i32p, _i32p, C.c_int64,
            _i64p, _i64p, _i32p, _i32p, C.c_int32]
        _LIB = lib
    except Exception as e:
        from ..utils.fallback import warn_fallback
        warn_fallback("fmwalk.cpp (host SA resolver)", e)
        _LIB_FAILED = True
        _LIB = None
    return _LIB


class HostResolver:
    """rows -> tidx resolver over the host copy of the packed BWT blocks.

    Built from the same pack_bwt_blocks array that DeviceFMIndex uploads
    (DeviceFMIndex.build(keep_host_blocks=True) retains it), so host and
    device walks read identical bytes.
    """

    def __init__(self, host_blocks: np.ndarray, idx, wide: bool,
                 max_steps: int = 4096, nthreads: int = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native fmwalk unavailable")
        self.lib = lib
        self.blocks = np.ascontiguousarray(host_blocks, np.uint32)
        self.word_off = 8 if wide else 4
        assert host_blocks.shape[1] == self.word_off + 32
        # REAL block count, not the array length: sharded callers pass
        # fm-axis _pad_to'd rows, and fmwalk.cpp's count-down rank treats
        # row blk+1 < nblk as a valid occ checkpoint -- a zero pad row
        # there would yield negative/garbage ranks for every row in the
        # back half of the last real block (bwt_len % 512 >= 258)
        self.nblk = min(host_blocks.shape[0],
                        (int(idx.bwt_len) + 511) // 512)
        self.fchr = np.ascontiguousarray(idx.fchr, np.int64)
        self.offs = np.ascontiguousarray(idx.offs, np.int32)
        self.brows = np.ascontiguousarray(idx.boundary_rows, np.int64)
        self.brefs = np.ascontiguousarray(idx.boundary_refidx, np.int32)
        self.zoff = int(idx.zoff)
        self.offrate = int(idx.offrate)
        self.sample_mask = (1 << self.offrate) - 1
        self.narrow = int(idx.npat <= 0xFFFF)
        self.max_steps = max_steps
        self.wide = wide                  # resolver-protocol attribute
        # host walk takes any row count: callers need not pad to a jit
        # shape bucket (each padded zero-row costs a full wasted walk)
        self.needs_bucket = False
        self.nthreads = nthreads or min(8, os.cpu_count() or 1)
        # ftab tables for the host extension search (first_hits)
        self.ftab_top = np.ascontiguousarray(idx.ftab_top, np.int64)
        self.ftab_bot = np.ascontiguousarray(idx.ftab_bot, np.int64)
        self.ftab_chars = int(idx.ftab_chars)
        # cumulative LF steps across calls (--met ResBWOp; the
        # reference's WalkMetrics bwops, group_walk.h:884,987)
        self.bwops = 0

    def first_hits(self, seqs, offsets):
        """One greedy partialSearch per lane from the given offsets: the
        host twin of engine.search_first_hits, same 6-array output shape
        ([h_top, h_bot, h_off, h_len, nhits, sums], each (n, 1) / (n,)).
        A handful of extension misses never pays a device round trip."""
        n = len(seqs)
        h_top = np.empty((n, 1), np.int64)
        h_bot = np.empty((n, 1), np.int64)
        h_off = np.empty((n, 1), np.int32)
        h_len = np.empty((n, 1), np.int32)
        nhits = np.ones(n, np.int32)
        sums = np.zeros(n, np.int32)
        if n == 0:
            return [h_top, h_bot, h_off, h_len, nhits, sums]
        lens = np.fromiter((len(s) for s in seqs), np.int32, n)
        starts = np.cumsum(lens, dtype=np.int64) - lens
        flat = np.ascontiguousarray(
            np.concatenate(seqs) if lens.sum() else np.zeros(1, np.uint8),
            np.uint8)
        offs = np.ascontiguousarray(offsets, np.int32)
        self.lib.fm_first_hits(
            self.blocks, self.nblk, self.word_off, self.fchr, self.zoff,
            self.ftab_top, self.ftab_bot, self.ftab_chars,
            flat, starts, lens, offs, n,
            h_top.reshape(-1), h_bot.reshape(-1),
            h_off.reshape(-1), h_len.reshape(-1), self.nthreads)
        return [h_top, h_bot, h_off, h_len, nhits, sums]

    def __call__(self, rows) -> np.ndarray:
        rows = np.ascontiguousarray(np.asarray(rows), np.int64)
        out = np.empty(rows.shape[0], np.int32)
        if rows.shape[0] == 0:
            return out
        steps = C.c_int64(0)
        self.lib.fm_resolve_rows(
            self.blocks, self.nblk, self.word_off, self.fchr,
            self.offs, self.offs.shape[0], self.brows, self.brefs,
            self.brows.shape[0], self.zoff, self.sample_mask,
            self.offrate, self.narrow, self.max_steps, rows, out,
            rows.shape[0], self.nthreads, C.byref(steps))
        self.bwops += int(steps.value)
        return out


def ftab_extend(host_blocks, idx, wide: bool, nthreads: int = None):
    """Depth-12 ftab from the depth-10 one (fm_ftab_extend): 16 LF-pair
    extensions per entry over the packed block rows. Returns (top12,
    bot12) int64[4^12] indexed by the engine's 24-bit window integer, or
    None when the native library is unavailable (callers then skip the
    deep-ftab start)."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_ftab_extend_bound"):
        lib.fm_ftab_extend.argtypes = [
            _u32p, C.c_int64, C.c_int32, _i64p, C.c_int64, C.c_int64,
            _i64p, _i64p, _i64p, _i64p, C.c_int32]
        lib._ftab_extend_bound = True
    blocks = np.ascontiguousarray(host_blocks, np.uint32)
    fchr = np.ascontiguousarray(idx.fchr, np.int64)
    t10 = np.ascontiguousarray(idx.ftab_top, np.int64)
    b10 = np.ascontiguousarray(idx.ftab_bot, np.int64)
    n10 = t10.shape[0] - 1 if t10.shape[0] == (1 << 20) + 1 \
        else t10.shape[0]
    assert n10 == 1 << 20, n10
    out_t = np.empty(1 << 24, np.int64)
    out_b = np.empty(1 << 24, np.int64)
    lib.fm_ftab_extend(blocks, blocks.shape[0], 8 if wide else 4,
                       fchr, int(idx.zoff), n10, t10, b10, out_t, out_b,
                       nthreads or min(8, os.cpu_count() or 1))
    return out_t, out_b
