"""Numpy reference implementation of FM-index primitives.

This is the bit-exact oracle used (a) by the host-side classification
oracle for parity testing and (b) as the ground truth the JAX/Pallas
kernels are property-tested against.

Semantics follow the reference engine:
- rank_c(row) counts occurrences of c strictly before `row` in the BWT,
  never counting the '$' (stored as code 0 at zoff) as an 'A'
  (bt2_idx.h:2192-2227 countBt2Side and its $-adjustment).
- LF(row, c) = fchr[c] + rank_c(row)  (bt2_idx.h:2803-2855).
- ftab lookup resolves the first ftabChars characters of a backward search
  in one step (bt2_idx.h:1826-1946).
- try_offset / resolve_row reproduce tryOffset (bt2_idx.h:1980-2014) and the
  GroupWalk LF-walk (group_walk.h:474-512): the SA sample payload is a
  *sequence index*, so walking adds no step correction.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..index.cf_io import CFIndex


class FMOracle:
    """Occ/LF machinery over a decoded CFIndex, with O(1) rank queries."""

    OCC_BLOCK = 128  # bases per checkpoint block

    def __init__(self, idx: CFIndex):
        self.idx = idx
        bwt = idx.bwt
        n = bwt.shape[0]
        nblk = (n + self.OCC_BLOCK - 1) // self.OCC_BLOCK + 1
        # occ[b, c] = count of c in bwt[0 : b*OCC_BLOCK]
        occ = np.zeros((nblk, 4), dtype=np.int64)
        pad = nblk * self.OCC_BLOCK - n
        padded = np.concatenate([bwt, np.full(pad, 255, np.uint8)])
        blocks = padded.reshape(nblk, self.OCC_BLOCK)
        for c in range(4):
            cnt = (blocks[:-1] == c).sum(axis=1)
            occ[1:, c] = np.cumsum(cnt)
        self.occ = occ
        self.bwt = bwt
        self.zoff = int(idx.zoff)
        self.fchr = idx.fchr.astype(np.int64)
        self.npat = idx.npat
        # boundary map as sorted arrays for O(log) lookup
        self.b_rows = idx.boundary_rows.astype(np.int64)
        self.b_refs = idx.boundary_refidx.astype(np.int64)
        self.last_boundary = int(self.b_rows.max()) if self.b_rows.size else 0
        self.sample_shift = idx.offrate
        self.sample_mask = (1 << idx.offrate) - 1
        self.offs = idx.offs.astype(np.int64)

    # ---- rank / LF ----

    def rank(self, rows, c) -> np.ndarray:
        """rank_c(row): occurrences of c in bwt[0:row], $ not counted as A.

        Vectorized over arrays of rows/chars.
        """
        rows = np.asarray(rows, dtype=np.int64)
        c = np.asarray(c, dtype=np.int64)
        blk = rows // self.OCC_BLOCK
        base = self.occ[blk, c]
        starts = blk * self.OCC_BLOCK
        # count within block: scalar loop acceptable for oracle use
        if rows.ndim == 0:
            within = int(np.count_nonzero(self.bwt[starts:rows] == c))
            res = base + within
            if c == 0 and self.zoff < rows:
                res -= 1
            return res
        within = np.fromiter(
            (np.count_nonzero(self.bwt[s:r] == cc)
             for s, r, cc in zip(starts.ravel(), rows.ravel(), c.ravel())),
            dtype=np.int64, count=rows.size).reshape(rows.shape)
        res = base + within
        res -= ((c == 0) & (self.zoff < rows)).astype(np.int64)
        return res

    def lf(self, rows, c):
        """LF mapping on character c (top/bot step of backward search)."""
        return self.fchr[np.asarray(c, dtype=np.int64)] + self.rank(rows, c)

    def lf_row(self, row: int) -> int:
        """LF using the character at `row` itself (left-walk step).

        The '$' row maps via its stored code 0, matching the reference's
        rowL + countBt2Side behaviour.
        """
        c = int(self.bwt[row])
        return int(self.lf(row, c))

    # ---- ftab ----

    def ftab_lookup(self, codes: np.ndarray) -> Tuple[int, int]:
        """Initial range for the last `ftab_chars` codes of a search.

        `codes` = the window of the pattern, in pattern order; the integer
        packs the window left-to-right (first char in the most significant
        bit-pair) because the classify index is loaded fw
        (bt2_idx.h:1830-1854 with fw()==true; centrifuge.cpp:2878-2882).
        Returns (top, bot); any code > 3 gives (0, 0).
        """
        fc = self.idx.ftab_chars
        assert codes.shape[0] == fc
        if (codes > 3).any():
            return 0, 0
        fi = 0
        for i in range(fc):
            fi = (fi << 2) | int(codes[i])
        return int(self.idx.ftab_top[fi]), int(self.idx.ftab_bot[fi])

    # ---- SA resolution ----

    def try_offset(self, row: int) -> int:
        """Resolve row -> sequence index if immediately possible, else -1.

        Mirrors tryOffset (bt2_idx.h:1980-2014): the '$' row resolves to 0,
        sampled rows read the SA sample, genome-boundary rows read the .4
        map (value truncated to u16 when the sample is 16-bit wide).
        """
        if row == self.zoff:
            return 0
        if (row & self.sample_mask) == 0:
            return int(self.offs[row >> self.sample_shift])
        if self.last_boundary > 0 and row <= self.last_boundary:
            i = np.searchsorted(self.b_rows, row)
            if i < self.b_rows.shape[0] and self.b_rows[i] == row:
                v = int(self.b_refs[i])
                return v if self.npat > 0xFFFF else (v & 0xFFFF)
        return -1

    def resolve_row(self, row: int, max_steps: int = 1 << 30) -> int:
        """Walk LF until the row resolves to a sequence index.

        Per-element equivalent of the GroupWalk advance: each LF step moves
        one position left in the text; because the payload is a sequence
        index (not an offset), no correction is added (group_walk.h:508-512).
        """
        for _ in range(max_steps):
            v = self.try_offset(row)
            if v >= 0:
                return v
            row = self.lf_row(row)
        raise RuntimeError("resolve_row: walk did not terminate")

    # ---- text restore (debug/validation) ----

    def restore_text(self) -> np.ndarray:
        """Rebuild the joined text (2-bit codes) by LF-walking.

        The suffix sort treats '$' as the *largest* character (bowtie
        lineage), so the '$'-suffix occupies the last BWT row; its BWT
        character is text[-1] and LF-walking from there yields the text
        right-to-left.
        """
        n = self.idx.length
        out = np.empty(n, dtype=np.uint8)
        row = self.idx.bwt_len - 1
        for i in range(n - 1, -1, -1):
            c = int(self.bwt[row])
            out[i] = c
            row = self.lf_row(row)
        return out
