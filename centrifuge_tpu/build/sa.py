"""Suffix-array construction: native SA-IS with a numpy fallback.

The native path compiles build/sais.cpp on first use (g++ -O3 -shared)
and calls it through ctypes -- this replaces the reference's blockwise
suffix sorter (blockwise_sa.h / diff_sample.h / ls.h) with a linear-time
in-memory SA-IS. The fallback is O(n log^2 n) numpy prefix doubling.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_LIB_FAILED = False


def _load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_HERE, "sais.cpp")
    try:
        from ..native.compile import build_native
        lib = ctypes.CDLL(build_native(src))
        lib.build_sa_2bit.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.build_sa_2bit.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:
        from ..utils.fallback import warn_fallback
        warn_fallback("sais.cpp (suffix-array builder)", e)
        _LIB_FAILED = True
    return _LIB


def suffix_array_doubling(codes: np.ndarray) -> np.ndarray:
    """SA of codes + end-larger terminator by prefix doubling (fallback).

    Matches the reference convention: a suffix that is a proper prefix
    of another sorts AFTER it (out-of-range compares greater), and the
    empty suffix (position n) sorts last.
    """
    n = codes.shape[0] + 1
    big = np.int64(1) << 40
    rank = np.full(n, big, dtype=np.int64)
    rank[:-1] = codes.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, big, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        new_rank = np.zeros(n, dtype=np.int64)
        r1 = rank[order]
        r2 = key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """SA (length n+1, sa[0] == n) of the 2-bit text + implicit '$'."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = codes.shape[0]
    lib = _load_native()
    if lib is not None:
        sa = np.empty(n + 1, dtype=np.int64)
        lib.build_sa_2bit(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return sa
    return suffix_array_doubling(codes)
