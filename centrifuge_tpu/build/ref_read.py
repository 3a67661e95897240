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


def scan_fastas(paths: List[str]):
    """Scan FASTA files into (codes, szs, refnames, plen).

    codes: uint8[joined_len] 2-bit codes of all unambiguous characters.
    szs:   List[RefRecord] in file order.
    refnames: full header lines of non-empty sequences.
    plen: per-sequence length INCLUDING interior/leading/trailing
          ambiguous gaps (bt2_idx.h:3318-3330).
    """
    szs: List[RefRecord] = []
    refnames: List[str] = []
    plen: List[int] = []
    chunks: List[np.ndarray] = []

    for path in paths:
        with open(path, "rb") as f:
            data = f.read()
        pos = 0
        n = len(data)
        while pos < n:
            # find next header
            gt = data.find(b">", pos)
            if gt < 0:
                break
            eol = data.find(b"\n", gt)
            if eol < 0:
                break
            name = data[gt + 1:eol].rstrip(b"\r").decode()
            nxt = data.find(b">", eol)
            body = data[eol + 1: nxt if nxt >= 0 else n]
            pos = nxt if nxt >= 0 else n

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
                    chunks.append(_CODE[arr[s:e]])
                else:
                    pending_gap = int(e - s)
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
