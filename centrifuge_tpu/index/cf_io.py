"""Reader for Centrifuge `.cf` index files into plain numpy arrays.

File layout (little-endian, 64-bit index_t; see the reference's
bt2_io.h:42-690 for .1/.2, bt2_idx.h:623-854 for .3/.4, and
bt2_idx.h:3379-3860 for the writer):

basename.1.cf:
  u32 sentinel(=1), u64 len, i32 lineRate, i32 linesPerSide(legacy=2),
  i32 offRate, i32 ftabChars, i32 flags(negated bitfield),
  u64 nPat, u64 plen[nPat],
  u64 nFrag, u64 rstarts[nFrag*3]   (joined-off, seq-idx, seq-off),
  u8  ebwt[numSides * sideSz]       (each side: sideBwtSz bytes of 2-bit
                                     BWT chars + 4 x u64 occ checkpoints),
  u64 zOff                          (row holding the '$'),
  u64 fchr[5]                       (cumulative character counts),
  u64 ftab[4^ftabChars + 1], u64 eftab[2*ftabChars],
  refnames ('\n'-separated, '\0'-terminated)

basename.2.cf:
  u32 sentinel, then ceil((len+1)/2^offRate) SA-sample entries; each entry is
  the *sequence index* of the suffix at every 2^offRate-th BWT row, stored as
  u16, or u32 when nPat > 65535 (bt2_io.h:528-547).

basename.3.cf: taxonomy payload: uid->taxID table, pruned tree, name table,
  size table (bt2_idx.h:623-707).

basename.4.cf: SA rows at genome boundaries -> refIdx (bt2_idx.h:789-853).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from .taxonomy import Taxonomy, TaxonomyNode


@dataclass
class CFIndex:
    """A fully decoded Centrifuge FM-index.

    The BWT is decoded out of the side/checkpoint layout into a flat 2-bit
    code array (`bwt`), with the '$' represented as code 0 at row `zoff`
    (exactly how the reference stores it; the rank routines must not count
    it as an 'A').
    """

    # geometry
    length: int          # joined text length (without $)
    bwt_len: int         # length + 1
    offrate: int         # SA sample rate log2 (default 4 -> every 16th row)
    ftab_chars: int      # chars resolved by the initial ftab lookup (10)
    # core arrays
    bwt: np.ndarray      # uint8[bwt_len] 2-bit codes ($ as 0 at zoff)
    zoff: int            # row of '$'
    fchr: np.ndarray     # uint64[5] cumulative char counts
    ftab: np.ndarray     # uint64[4^ftabChars+1] raw entries
    eftab: np.ndarray    # uint64[2*ftabChars]
    offs: np.ndarray     # SA sample: sequence index per sampled row
    # reference structure
    npat: int
    plen: np.ndarray     # uint64[nPat] sequence lengths
    rstarts: np.ndarray  # uint64[nFrag,3]
    refnames: List[str]
    # taxonomy payload
    uid_to_tid: List[Tuple[str, int]] = field(default_factory=list)
    taxonomy: Taxonomy = field(default_factory=Taxonomy)
    compressed: bool = False
    # genome-boundary SA rows (.4.cf)
    boundary_rows: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint64))
    boundary_refidx: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint32))

    # --- derived, filled by finalize() ---
    ftab_top: np.ndarray = None  # resolved top per ftab entry
    ftab_bot: np.ndarray = None  # resolved bot per ftab entry (entry i+1's lo)

    def finalize(self) -> None:
        """Precompute gather-friendly derived tables."""
        self.ftab_top, self.ftab_bot = _resolve_ftab(
            self.ftab, self.eftab, self.length, self.ftab_chars)

    @property
    def sample_mask(self) -> int:
        return (1 << self.offrate) - 1


def _resolve_ftab(ftab: np.ndarray, eftab: np.ndarray, length: int,
                  ftab_chars: int):
    """Resolve raw ftab entries to (top[i], bot[i]) arrays.

    A raw entry > len is an extended entry: entry ^ ~0 indexes eftab, where
    eftab[2k] is the "lo" value and eftab[2k+1] the "hi" value
    (bt2_idx.h:1878-1973). The search uses top = hi(ftab[i]) and
    bot = lo(ftab[i+1]).
    """
    n = ftab.shape[0]
    raw = ftab.astype(np.uint64)
    ext = raw > np.uint64(length)
    ef_idx = (raw ^ np.uint64(0xFFFFFFFFFFFFFFFF)).astype(np.int64)
    lo = np.where(ext, eftab[np.where(ext, 2 * ef_idx, 0)], raw).astype(np.uint64)
    hi = np.where(ext, eftab[np.where(ext, 2 * ef_idx + 1, 0)], raw).astype(np.uint64)
    # top for pattern i, bot for pattern i is lo of entry i+1
    top = hi[:-1].copy()
    bot = lo[1:].copy()
    return top, bot


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise IOError(f"short read: wanted {n}, got {len(b)}")
    return b


def _ru32(f) -> int:
    return struct.unpack("<I", _read_exact(f, 4))[0]


def _ri32(f) -> int:
    return struct.unpack("<i", _read_exact(f, 4))[0]


def _ru64(f) -> int:
    return struct.unpack("<Q", _read_exact(f, 8))[0]


def _ru16(f) -> int:
    return struct.unpack("<H", _read_exact(f, 2))[0]


def decode_bwt_sides(ebwt: np.ndarray, num_sides: int, side_sz: int,
                     bwt_len: int) -> np.ndarray:
    """Decode side-packed 2-bit BWT bytes into a flat uint8 code array.

    Each side is side_sz bytes: (side_sz - 32) payload bytes then 4 u64
    occ checkpoints, which we drop (we rebuild our own checkpoints in
    whatever block geometry the compute backend wants). Characters are
    packed 4 per byte, little-endian bit pairs (bitpack.h:36-39).
    """
    side_bwt_sz = side_sz - 32
    sides = ebwt.reshape(num_sides, side_sz)
    payload = sides[:, :side_bwt_sz].reshape(-1)  # all BWT bytes in order
    # unpack 4 bases per byte
    codes = np.empty(payload.shape[0] * 4, dtype=np.uint8)
    codes[0::4] = payload & 3
    codes[1::4] = (payload >> 2) & 3
    codes[2::4] = (payload >> 4) & 3
    codes[3::4] = (payload >> 6) & 3
    return codes[:bwt_len]


def load_cf_index(basename: str, load_sa_sample: bool = True) -> CFIndex:
    """Load basename.{1,2,3,4}.cf into a CFIndex."""
    with open(basename + ".1.cf", "rb") as f:
        one = _ru32(f)
        if one != 1:
            raise IOError("big-endian .cf indexes are not supported")
        length = _ru64(f)
        line_rate = _ri32(f)
        _ri32(f)  # legacy linesPerSide
        offrate = _ri32(f)
        ftab_chars = _ri32(f)
        _ri32(f)  # flags (color/entireReverse) - classification path ignores
        bwt_len = length + 1
        side_sz = 1 << line_rate
        side_bwt_sz = side_sz - 32  # 4 x u64 checkpoints
        side_bwt_len = side_bwt_sz * 4
        bwt_sz = length // 4 + 1
        num_sides = (bwt_sz + side_bwt_sz - 1) // side_bwt_sz
        ftab_len = (1 << (ftab_chars * 2)) + 1
        eftab_len = ftab_chars * 2

        npat = _ru64(f)
        plen = np.frombuffer(_read_exact(f, 8 * npat), dtype="<u8").copy()
        nfrag = _ru64(f)
        rstarts = np.frombuffer(_read_exact(f, 8 * nfrag * 3), dtype="<u8")
        rstarts = rstarts.reshape(nfrag, 3).copy()
        ebwt = np.frombuffer(_read_exact(f, num_sides * side_sz), dtype=np.uint8)
        zoff = _ru64(f)
        fchr = np.frombuffer(_read_exact(f, 8 * 5), dtype="<u8").copy()
        ftab = np.frombuffer(_read_exact(f, 8 * ftab_len), dtype="<u8").copy()
        eftab = np.frombuffer(_read_exact(f, 8 * eftab_len), dtype="<u8").copy()
        names_blob = f.read()
        names = names_blob.split(b"\x00")[0].decode()
        refnames = [n for n in names.split("\n") if n]

    bwt = decode_bwt_sides(ebwt, num_sides, side_sz, bwt_len)

    offs = np.zeros(0, np.uint32)
    if load_sa_sample:
        offs_len = (bwt_len + (1 << offrate) - 1) >> offrate
        with open(basename + ".2.cf", "rb") as f:
            _ru32(f)
            wide = npat > 0xFFFF
            dt = "<u4" if wide else "<u2"
            offs = np.frombuffer(
                _read_exact(f, (4 if wide else 2) * offs_len), dtype=dt
            ).astype(np.uint32)

    idx = CFIndex(
        length=length, bwt_len=bwt_len, offrate=offrate,
        ftab_chars=ftab_chars, bwt=bwt, zoff=zoff, fchr=fchr, ftab=ftab,
        eftab=eftab, offs=offs, npat=npat, plen=plen, rstarts=rstarts,
        refnames=refnames,
    )

    _load_taxonomy(basename, idx)
    _load_boundaries(basename, idx)
    idx.finalize()
    return idx


def _load_taxonomy(basename: str, idx: CFIndex) -> None:
    """Load the .3.cf taxonomy payload (bt2_idx.h:623-707)."""
    path = basename + ".3.cf"
    if not os.path.exists(path):
        return
    tax = idx.taxonomy
    num_cids = 0
    with open(path, "rb") as f:
        _ru32(f)
        nref = _ru64(f)
        leaves = set()
        for _ in range(nref):
            uid_bytes = bytearray()
            while True:
                c = _read_exact(f, 1)
                if c in (b"\x00", b"\n"):
                    break
                uid_bytes += c
            uid = uid_bytes.decode()
            if uid.startswith("cid"):
                num_cids += 1
            tid = _ru64(f)
            idx.uid_to_tid.append((uid, tid))
            leaves.add(tid)
        ntid = _ru64(f)
        for _ in range(ntid):
            tid = _ru64(f)
            parent = _ru64(f)
            rank = _ru16(f)
            tax.tree[tid] = TaxonomyNode(parent, rank, tid in leaves)
        nname = _ru64(f)
        for _ in range(nname):
            tid = _ru64(f)
            name_bytes = bytearray()
            while True:
                c = _read_exact(f, 1)
                if c in (b"\n", b""):
                    break
                name_bytes += c
            # '@' encodes spaces (bt2_idx.h:689)
            tax.names[tid] = name_bytes.decode().replace("@", " ")
        nsize = _ru64(f)
        for _ in range(nsize):
            tid = _ru64(f)
            sz = _ru64(f)
            tax.sizes[tid] = sz
    # >= 10 "cid*" uids marks a species-compressed database
    # (bt2_idx.h:648-663); it widens the in-flight hit cap.
    idx.compressed = num_cids >= 10
    tax.propagate_average_sizes()
    tax.build_paths([t for _, t in idx.uid_to_tid])


def _load_boundaries(basename: str, idx: CFIndex) -> None:
    """Load the .4.cf genome-boundary SA rows; optional (bt2_idx.h:789-853)."""
    path = basename + ".4.cf"
    if not os.path.exists(path):
        return
    with open(path, "rb") as f:
        _ru32(f)
        n = _ru64(f)
        rows = np.empty(n, np.uint64)
        refs = np.empty(n, np.uint32)
        for i in range(n):
            rows[i] = _ru64(f)
            refs[i] = _ru32(f)
    order = np.argsort(rows, kind="stable")
    idx.boundary_rows = rows[order]
    idx.boundary_refidx = refs[order]
