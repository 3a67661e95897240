"""Deterministic per-read RNG matching the reference's tie-breaking.

The reference shuffles equal-score result streaks with a small LCG seeded
per read from the read's content (random_source.h:34-61, pat.h:55-91,
ds.h:784-795). Byte-for-byte output parity requires replicating all three.
"""

from __future__ import annotations

M32 = 0xFFFFFFFF
LCG_A = 1664525
LCG_C = 1013904223


class LCG:
    """32-bit LCG; nextU32 mixes two steps (random_source.h:52-61)."""

    def __init__(self, seed: int = 0):
        self.last = seed & M32

    def next_u32(self) -> int:
        self.last = (LCG_A * self.last + LCG_C) & M32
        ret = self.last >> 16
        self.last = (LCG_A * self.last + LCG_C) & M32
        return (ret ^ self.last) & M32


def shuffle_portion(items: list, begin: int, num: int, rnd: LCG) -> None:
    """In-place partial Fisher-Yates exactly as EList::shufflePortion."""
    if num < 2:
        return
    left = num
    for i in range(begin, begin + num - 1):
        r = rnd.next_u32() % left
        if r > 0:
            items[i], items[i + r] = items[i + r], items[i]
        left -= 1


def _xor_fold_segments(vals: "np.ndarray", lens: "np.ndarray", n: int,
                       shift_mask: int, shift_mul: int):
    """XOR-fold `vals` (int64, concatenated variable-length rows given by
    `lens`) per row, each element pre-shifted by ((pos & mask) * mul)
    where pos is its offset within its row. Zero-length rows fold to 0.

    Segmented XOR without per-row Python: a cumulative-XOR prefix trick
    would need an inverse, and XOR has one (itself) -- prefix[ends] ^
    prefix[starts] gives each segment's fold in O(total).
    """
    import numpy as np
    out = np.zeros(n, dtype=np.int64)
    total = int(vals.shape[0])
    if total == 0:
        return out
    starts = np.cumsum(lens) - lens
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    shifted = vals << ((pos & shift_mask) << shift_mul)
    prefix = np.bitwise_xor.accumulate(shifted)
    ends = starts + lens
    seg = prefix[ends - 1]                       # fold of [0, end)
    nz = starts > 0
    seg = seg ^ np.where(nz, prefix[np.maximum(starts, 1) - 1], 0)
    out[lens > 0] = seg[lens > 0]
    return out


def _concat_offsets(parts, np):
    lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    off = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    return off, lens


def gen_read_seeds_batch(recs, seed: int, flat3=None):
    """Vectorized gen_read_seed over a batch of ReadRecs.

    Fast path: the native gen_seeds (assign.cpp) folds concatenated
    seq/qual/name buffers in C threads (~2 ms for 8k reads). Fallback:
    segmented XOR prefix scans over one concatenated buffer per fold --
    no per-read numpy calls (they dominated at ~15 us/read).

    flat3: optional (flat, lens, offsets) of concatenated rec.seq from
    classify.pipeline.batch_flat_seqs, to skip re-concatenating.
    """
    import numpy as np
    n = len(recs)
    base = ((seed + 101) * 59 * 61 * 67 * 71 * 73 * 79 * 83) & M32
    out = np.full(n, base, dtype=np.int64)
    if n == 0:
        return out.astype(np.uint32)
    try:
        from ..native.engine import load_native
        lib = load_native()
    except Exception:
        lib = None
    if lib is not None:
        if flat3 is not None:
            sflat, _, soff = flat3
            sflat = sflat.astype(np.uint8, copy=False)
        else:
            soff, _ = _concat_offsets([r.seq for r in recs], np)
            sflat = (np.concatenate([r.seq for r in recs])
                     .astype(np.uint8, copy=False))
        qflat = np.frombuffer(b"".join(r.qual for r in recs), np.uint8)
        qoff, _ = _concat_offsets([r.qual for r in recs], np)
        nflat = np.frombuffer(b"".join(r.name for r in recs), np.uint8)
        noff, _ = _concat_offsets([r.name for r in recs], np)
        res = np.empty(n, dtype=np.uint32)
        lib.gen_seeds(np.ascontiguousarray(sflat), soff,
                      np.ascontiguousarray(qflat), qoff,
                      np.ascontiguousarray(nflat), noff, n, base, res)
        return res
    slens = np.fromiter((len(r.seq) for r in recs), np.int64, n)
    sflat = np.concatenate([r.seq for r in recs]).astype(np.int64)
    out ^= _xor_fold_segments(sflat, slens, n, 15, 1)
    qcat = b"".join(r.qual for r in recs)
    qlens = np.fromiter((len(r.qual) for r in recs), np.int64, n)
    qflat = np.frombuffer(qcat, np.uint8).astype(np.int64)
    out ^= _xor_fold_segments(qflat, qlens, n, 3, 3)
    names = []
    for r in recs:
        name = r.name
        slash = name.find(b"/")
        names.append(name[:slash] if slash >= 0 else name)
    ncat = b"".join(names)
    nlens = np.fromiter((len(x) for x in names), np.int64, n)
    nflat = np.frombuffer(ncat, np.uint8).astype(np.int64)
    out ^= _xor_fold_segments(nflat, nlens, n, 3, 3)
    return (out & M32).astype(np.uint32)


def gen_read_seed(seq_codes, qual: bytes, name: bytes, seed: int) -> int:
    """Per-read seed from sequence codes (0-4), quals, and name (pat.h:55-91).

    The name contributes only up to the first '/'.
    """
    import numpy as np
    rseed = ((seed + 101) * 59 * 61 * 67 * 71 * 73 * 79 * 83) & M32
    n = len(seq_codes)
    if n:
        shifts = (np.arange(n) & 15) << 1
        vals = seq_codes.astype(np.int64) << shifts
        # XOR-fold the per-position contributions per shift class
        rseed ^= int(np.bitwise_xor.reduce(vals))
    q = np.frombuffer(qual, np.uint8)
    if q.shape[0]:
        rseed ^= int(np.bitwise_xor.reduce(
            q.astype(np.int64) << ((np.arange(q.shape[0]) & 3) << 3)))
    slash = name.find(b"/")
    nm = np.frombuffer(name[:slash] if slash >= 0 else name, np.uint8)
    if nm.shape[0]:
        rseed ^= int(np.bitwise_xor.reduce(
            nm.astype(np.int64) << ((np.arange(nm.shape[0]) & 3) << 3)))
    return rseed & M32
