"""HyperLogLog++ distinct-element sketch, vectorized in numpy.

Per-taxon distinct 32-mer counting (SpeciesMetrics::addAllKmers,
aln_sink.h:174-190; sketch in hyperloglogplus.h:211-623, Heule et al.
2013). Precision 10 (hyperloglogplus.h:240); hashing is the murmur3
finalizer (hyperloglogplus.h:72-80).

Bit-exact with the reference implementation (tests/fixtures/
hll_golden.json, generated from the reference header), including its
quirks:

* sparse mode stores 32-bit ENCODED hashes (encodeHashIn32Bit,
  hyperloglogplus.h:557-577: top-25-bit index, flag+rank when hash bits
  53..39 are all zero) in a set, so the distinct count is over encodings;
* the sparse estimate is linearCounting(2^24, 2^24 - size) -- the
  reference's mPrime is `1 << (pPrime-1)` (hyperloglogplus.h:228), not
  2^25 as its comment says;
* sparse switches to dense registers past m entries, not 6m
  (hyperloglogplus.h:289);
* dense estimation (hyperloglogplus.h:395-431): raw harmonic-mean
  estimate, Heule bias interpolation when est <= 5m, and linear counting
  whenever more than 2 registers are zero -- the threshold[] comparison
  is dead code (`return lc_estimate; // always use lc` quirk);
* results are double->uint64 truncations, not roundings.
"""

from __future__ import annotations

import numpy as np

M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

P_PRIME = 25                 # sparse precision (hyperloglogplus.h:226)
M_PRIME = 1 << (P_PRIME - 1)  # reference quirk: 2^24, not 2^25


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


def _linear_counting(m: int, v: int) -> float:
    return float(m) * np.log(float(m) / float(v))


def _leading_zeros64(x: np.ndarray) -> np.ndarray:
    """Vectorized count of leading zero bits of uint64 values (0 -> 64)."""
    lz = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    r = x[nz]
    shift = np.zeros(r.shape[0], dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        mask = r < (np.uint64(1) << np.uint64(64 - s))
        shift[mask] += s
        r[mask] = r[mask] << np.uint64(s)
    lz[nz] = shift
    return lz


def _rank_p(hashes: np.ndarray, p: int) -> np.ndarray:
    """get_rank (hyperloglogplus.h:464-475): leading zeros of the hash
    with the top p bits shifted off and p trailing ones appended, + 1."""
    with np.errstate(over="ignore"):
        bits = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    return (_leading_zeros64(bits) + 1).astype(np.uint8)


def _encode_sparse(hashes: np.ndarray, p: int) -> np.ndarray:
    """encodeHashIn32Bit (hyperloglogplus.h:557-577), vectorized."""
    idx = ((hashes >> np.uint64(64 - P_PRIME)) << np.uint64(7)).astype(
        np.uint32)
    # hash bits 53..39 (between the p-bit and pPrime-bit indexes)
    mid = (hashes >> np.uint64(64 - P_PRIME)) & np.uint64(
        (1 << (P_PRIME - p)) - 1)
    addl = _rank_p(hashes, P_PRIME).astype(np.uint32)
    flagged = idx | (addl << np.uint32(1)) | np.uint32(1)
    return np.where(mid == 0, flagged, idx)


def _decode_sparse(encoded: np.ndarray, p: int):
    """getIndexAndRankFromEncodedHash (hyperloglogplus.h:592-620)."""
    enc = encoded.astype(np.uint32)
    idx = (enc >> np.uint32(32 - p)).astype(np.int64)
    # flag set: rank = (pPrime - p) + bits 6..1
    r_flag = (P_PRIME - p) + ((enc >> np.uint32(1)) & np.uint32(0x3F))
    # flag clear: rank over the 32-bit encoding with top p bits shifted off
    with np.errstate(over="ignore"):
        bits32 = (enc << np.uint32(p)) | np.uint32((1 << p) - 1)
    lz = _leading_zeros64(bits32.astype(np.uint64)) - 32
    r_plain = lz + 1
    rank = np.where((enc & np.uint32(1)) == 1, r_flag, r_plain)
    return idx, rank.astype(np.uint8)


class HyperLogLogPlus:
    """One sketch; add() takes numpy arrays of uint64 items."""

    def __init__(self, precision: int = 10):
        self.p = precision
        self.m = 1 << precision
        self.sparse: set | None = set()   # 32-bit encoded hashes
        self.registers: np.ndarray | None = None

    def add(self, items: np.ndarray) -> None:
        if np.asarray(items).size == 0:
            return
        hashes = murmur3_finalizer(np.asarray(items, dtype=np.uint64))
        self.add_hashes(hashes)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if self.sparse is not None:
            self.sparse.update(_encode_sparse(hashes, self.p).tolist())
            if len(self.sparse) > self.m:
                self._to_dense()
        else:
            self._add_dense(hashes)

    def _to_dense(self) -> None:
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.sparse:
            enc = np.fromiter(self.sparse, dtype=np.uint32,
                              count=len(self.sparse))
            idx, rank = _decode_sparse(enc, self.p)
            np.maximum.at(self.registers, idx, rank)
        self.sparse = None

    def _add_dense(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rank = _rank_p(hashes, self.p)
        np.maximum.at(self.registers, idx, rank)

    def _estimate_bias(self, est: float) -> float:
        """getEstimateBias (hyperloglogplus.h:525-546): linear
        interpolation between the two bracketing raw-estimate cells."""
        if self.p != 10:
            raise NotImplementedError(
                "bias tables imported for precision 10 only (the only "
                "precision the reference instantiates)")
        from .hll_bias_p10 import BIAS_P10, RAW_ESTIMATE_P10
        raw, bias = RAW_ESTIMATE_P10, BIAS_P10
        if raw[0] >= est:
            return float(raw[0] - bias[0])
        if raw[-1] <= est:
            return float(raw[-1] - bias[-1])
        pos = int(np.searchsorted(raw, est, side="left"))
        e1, e2 = float(raw[pos - 1]), float(raw[pos])
        c = (est - e1) / (e2 - e1)
        return float(bias[pos - 1]) * (1 - c) + float(bias[pos]) * c

    def cardinality(self) -> int:
        if self.sparse is not None:
            # sparse estimate over the ENCODING space
            # (hyperloglogplus.h:396-400)
            return int(_linear_counting(M_PRIME,
                                        M_PRIME - len(self.sparse)))
        regs = self.registers.astype(np.float64)
        m = float(self.m)
        est = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        if est <= 5.0 * m:
            est -= self._estimate_bias(est)
        zeros = int((self.registers == 0).sum())
        if zeros > 2:
            # the reference returns linear counting unconditionally here;
            # its threshold[] check is dead code (hyperloglogplus.h:417-427)
            return int(_linear_counting(self.m, zeros))
        return int(est)

    def merge(self, other: "HyperLogLogPlus") -> None:
        """hyperloglogplus.h:364-389 merge semantics."""
        if self.sparse is not None and other.sparse is not None:
            if len(self.sparse) + len(other.sparse) > self.m:
                self._to_dense()
                self._add_encoded(other.sparse)
            else:
                self.sparse.update(other.sparse)
        elif other.sparse is not None:
            self._add_encoded(other.sparse)
        else:
            if self.sparse is not None:
                self._to_dense()
            np.maximum(self.registers, other.registers, out=self.registers)

    def _add_encoded(self, encoded) -> None:
        if not encoded:
            return
        enc = np.fromiter(encoded, dtype=np.uint32, count=len(encoded))
        idx, rank = _decode_sparse(enc, self.p)
        np.maximum.at(self.registers, idx, rank)


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
