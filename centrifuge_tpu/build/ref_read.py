"""Reference FASTA scanning for the index builder.

Replicates the reference's RefRecord semantics (ref_read.cpp:28-180,
ref_read.h:154-260): each record is (off, len, first) where `off` counts
the ambiguous-character gap preceding the record's unambiguous stretch
and `len` its length; `first` marks the first record of a sequence.
Character categories follow asc2dnacat (alphabet.cpp:36-58): ACGT/acgt
are DNA (cat 1), IUPAC ambiguity codes incl. N are gaps (cat 2), '-' is
a gap (cat 3), everything else (whitespace, digits) is ignored.
Sequence names are the full header line after '>'; empty sequences are
dropped (their names popped).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

# category table: 1 = DNA, 2 = ambiguous/gap, 0 = ignore
_CAT = np.zeros(256, dtype=np.uint8)
for _c in b"ACGTacgt":
    _CAT[_c] = 1
for _c in b"BDHKMNRSVWXYbdhkmnrsvwxy":
    _CAT[_c] = 2
_CAT[ord("-")] = 2  # cat 3 in the reference; treated as gap (cat >= 2)

_CODE = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    _CODE[_c] = _i
    _CODE[ord(chr(_c).lower())] = _i


@dataclass
class RefRecord:
    off: int    # ambiguous chars preceding this stretch
    length: int  # unambiguous stretch length
    first: bool  # first record of a sequence


class PackedCodes:
    """2-bit packed base codes (0.25 B/base) with numpy fancy indexing.

    Drop-in for the uint8 codes array wherever only `shape`, `len()`,
    and integer-array indexing are used (the streaming index writer and
    the blockwise sorter). The reference keeps its whole text 2-bit
    packed for exactly this reason (blockwise_sa.h works on a packed
    SString); the uint8 array it replaces costs 4x the RAM -- 64 GB at
    nt scale. The buffer carries 16 padding bytes so blocksa.cpp's
    unaligned 64-bit fetches stay in bounds (bsa_create contract).
    """

    __slots__ = ("packed", "n")

    def __init__(self, n: int, packed: "np.ndarray"):
        self.n = int(n)
        self.packed = packed

    @classmethod
    def from_codes(cls, codes: "np.ndarray") -> "PackedCodes":
        b = PackedCodesBuilder()
        b.append(codes)
        return b.finish()

    @property
    def shape(self):
        return (self.n,)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx):
        idx = np.asarray(idx)
        b = self.packed[idx >> 2]
        sh = ((idx & 3) << 1).astype(np.uint8)
        return ((b >> sh) & 3).astype(np.uint8)

    def unpack(self) -> "np.ndarray":
        """Full uint8 codes array (for the in-memory SA-IS path)."""
        nbytes = (self.n + 3) // 4
        b = self.packed[:nbytes]
        out = np.empty(nbytes * 4, np.uint8)
        out[0::4] = b & 3
        out[1::4] = (b >> 2) & 3
        out[2::4] = (b >> 4) & 3
        out[3::4] = (b >> 6) & 3
        return out[: self.n]


class PackedCodesBuilder:
    """Append uint8 code chunks, storing them 2-bit packed as they
    arrive, so the scan never holds more than one chunk unpacked."""

    def __init__(self):
        self.parts: List[np.ndarray] = []
        self.carry = np.zeros(0, np.uint8)  # 0..3 unpacked tail codes
        self.n = 0

    def append(self, arr: "np.ndarray") -> None:
        self.n += int(arr.shape[0])
        a = (np.concatenate([self.carry, arr])
             if self.carry.shape[0] else arr)
        nfull = a.shape[0] // 4
        q = a[: nfull * 4].reshape(-1, 4).astype(np.uint16)
        self.parts.append(
            (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
             | (q[:, 3] << 6)).astype(np.uint8))
        self.carry = a[nfull * 4:].copy()

    def finish(self) -> PackedCodes:
        tail = np.zeros(1, np.uint8)
        for i, c in enumerate(self.carry):
            tail[0] |= np.uint8(c) << np.uint8(2 * i)
        nbytes = (self.n + 3) // 4
        packed = np.zeros(nbytes + 16, np.uint8)
        pos = 0
        for p in self.parts:
            packed[pos: pos + p.shape[0]] = p
            pos += p.shape[0]
        if self.carry.shape[0]:
            packed[pos] = tail[0]
        return PackedCodes(self.n, packed)


def _iter_fasta(path: str, chunksize: int = 1 << 25):
    """Stream (header, body_bytes) records from a FASTA file.

    Reads the file in `chunksize` pieces so peak memory is one chunk
    plus one sequence body, never the whole file (the reference
    similarly streams through FileBuf, ref_read.cpp:28-180; holding raw
    nt-scale inputs in RAM would defeat --bmax's bounded-memory point,
    blockwise_sa.h:242-309). Matches the previous whole-file parser
    byte-for-byte: any '>' opens a header (bodies never contain one), a
    trailing header without a newline is dropped.
    """
    name = None
    hdr_parts: List[bytes] = []
    body_parts: List[bytes] = []
    in_header = False
    with open(path, "rb") as f:
        while True:
            data = f.read(chunksize)
            if not data:
                break
            pos = 0
            n = len(data)
            while pos < n:
                if name is None and not in_header:
                    gt = data.find(b">", pos)
                    if gt < 0:
                        pos = n
                    else:
                        in_header = True
                        pos = gt + 1
                elif in_header:
                    eol = data.find(b"\n", pos)
                    if eol < 0:
                        hdr_parts.append(data[pos:])
                        pos = n
                    else:
                        hdr_parts.append(data[pos:eol])
                        name = b"".join(hdr_parts).rstrip(b"\r").decode()
                        hdr_parts = []
                        in_header = False
                        pos = eol + 1
                else:
                    gt = data.find(b">", pos)
                    if gt < 0:
                        body_parts.append(data[pos:])
                        pos = n
                    else:
                        body_parts.append(data[pos:gt])
                        yield name, b"".join(body_parts)
                        body_parts = []
                        name = None
                        in_header = True
                        pos = gt + 1
    if name is not None:
        yield name, b"".join(body_parts)


def scan_fastas(paths: List[str], packed: bool = False):
    """Scan FASTA files into (codes, szs, refnames, plen).

    codes: uint8[joined_len] 2-bit codes of all unambiguous characters,
           or a PackedCodes (0.25 B/base) when packed=True -- the
           bounded-memory build path packs as it scans AND streams each
           input file in chunks, so peak memory is the packed text plus
           one sequence, not the raw file.
    szs:   List[RefRecord] in file order.
    refnames: full header lines of non-empty sequences.
    plen: per-sequence length INCLUDING interior/leading/trailing
          ambiguous gaps (bt2_idx.h:3318-3330).
    """
    szs: List[RefRecord] = []
    refnames: List[str] = []
    plen: List[int] = []
    chunks: List[np.ndarray] = []
    pbuf = PackedCodesBuilder() if packed else None

    for path in paths:
        for name, body in _iter_fasta(path):
            arr = np.frombuffer(body, dtype=np.uint8)
            cat = _CAT[arr]
            keep = cat > 0
            arr = arr[keep]
            cat = cat[keep]
            if arr.shape[0] == 0 or not (cat == 1).any():
                # empty / all-gap sequence: dropped entirely (its gap
                # chars would leak into the previous plen in the
                # reference -- a quirk we do not reproduce)
                continue
            refnames.append(name)
            plen.append(int(arr.shape[0]))
            # trailing gap chars contribute to plen but produce a
            # zero-len record the writer skips; trim them here
            is_dna = cat == 1
            last_dna = int(np.nonzero(is_dna)[0][-1])
            is_dna = is_dna[: last_dna + 1]
            arr = arr[: last_dna + 1]
            # run-length encode gap/DNA alternation
            boundaries = np.nonzero(np.diff(is_dna.astype(np.int8)))[0] + 1
            starts = np.concatenate([[0], boundaries])
            ends = np.concatenate([boundaries, [is_dna.shape[0]]])
            first = True
            pending_gap = 0
            for s, e in zip(starts, ends):
                if is_dna[s]:
                    szs.append(RefRecord(pending_gap, int(e - s), first))
                    first = False
                    pending_gap = 0
                    if pbuf is not None:
                        pbuf.append(_CODE[arr[s:e]])
                    else:
                        chunks.append(_CODE[arr[s:e]])
                else:
                    pending_gap = int(e - s)
    if pbuf is not None:
        return pbuf.finish(), szs, refnames, plen
    codes = (np.concatenate(chunks) if chunks
             else np.zeros(0, dtype=np.uint8))
    return codes, szs, refnames, plen


def get_uid(header: str) -> str:
    """uid = header prefix up to the first space or second '|'
    (bt2_idx.h:2999-3009)."""
    ndelim = 0
    j = 0
    while j < len(header):
        if header[j] == " ":
            break
        if header[j] == "|":
            ndelim += 1
            if ndelim == 2:
                break
        j += 1
    return header[:j]


def get_tid(stid: str) -> int:
    """Parse 'lo.hi' dual taxonomy ids into lo | hi<<32
    (bt2_idx.h:3011-3027)."""
    tid1 = 0
    tid2 = 0
    saw_dot = False
    for ch in stid:
        if ch == ".":
            saw_dot = True
            continue
        num = ord(ch) - ord("0")
        if saw_dot:
            tid2 = tid2 * 10 + num
        else:
            tid1 = tid1 * 10 + num
    return tid1 | (tid2 << 32)
