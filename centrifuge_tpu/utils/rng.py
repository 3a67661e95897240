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


def gen_read_seeds_batch(recs, seed: int):
    """Vectorized gen_read_seed over a batch of ReadRecs.

    Pads sequences/quals into matrices; padded zeros contribute 0 to the
    XOR fold, so the result matches the per-read function exactly.
    """
    import numpy as np
    n = len(recs)
    out = np.full(n, ((seed + 101) * 59 * 61 * 67 * 71 * 73 * 79 * 83)
                  & M32, dtype=np.int64)
    if n == 0:
        return out.astype(np.uint32)
    lmax = max(len(r.seq) for r in recs)
    qmax = max(len(r.qual) for r in recs)
    seqm = np.zeros((n, lmax), dtype=np.int64)
    qualm = np.zeros((n, max(qmax, 1)), dtype=np.int64)
    for i, r in enumerate(recs):
        seqm[i, : len(r.seq)] = r.seq
        q = np.frombuffer(r.qual, np.uint8)
        qualm[i, : q.shape[0]] = q
    sshift = (np.arange(lmax) & 15) << 1
    out ^= np.bitwise_xor.reduce(seqm << sshift[None, :], axis=1)
    qshift = (np.arange(qualm.shape[1]) & 3) << 3
    out ^= np.bitwise_xor.reduce(qualm << qshift[None, :], axis=1)
    for i, r in enumerate(recs):
        name = r.name
        slash = name.find(b"/")
        nm = np.frombuffer(name[:slash] if slash >= 0 else name, np.uint8)
        if nm.shape[0]:
            out[i] ^= int(np.bitwise_xor.reduce(
                nm.astype(np.int64) << ((np.arange(nm.shape[0]) & 3) << 3)))
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
