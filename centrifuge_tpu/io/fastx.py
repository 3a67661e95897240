"""FASTA/FASTQ read input.

Produces (name, seq_codes, qual) tuples with the same conventions as the
reference's pattern sources (pat.cpp): FASTA names keep the full header
line, FASTA quality strings are all 'I', sequences map ACGT->0..3 and
anything else (incl. N) -> 4.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

CODE_LUT = np.full(256, 4, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    CODE_LUT[_b] = _i
    CODE_LUT[ord(chr(_b).lower())] = _i

COMP = np.array([3, 2, 1, 0, 4], dtype=np.uint8)


@dataclass
class ReadRec:
    name: bytes      # full header (no leading '>'/'@')
    seq: np.ndarray  # uint8 codes 0-4
    qual: bytes

    def revcomp(self) -> np.ndarray:
        return COMP[self.seq[::-1]]


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_fastx(path: str) -> Iterator[ReadRec]:
    """Iterate reads from a FASTA or FASTQ file (gz ok); '-' reads stdin."""
    import sys
    f = sys.stdin.buffer if path == "-" else _open(path)
    try:
        first = f.readline()
        if not first:
            return
        if first.startswith(b">"):
            yield from _read_fasta(f, first)
        elif first.startswith(b"@"):
            yield from _read_fastq(f, first)
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ")
    finally:
        if path != "-":
            f.close()


def _read_fasta(f, first: bytes) -> Iterator[ReadRec]:
    name = first[1:].rstrip(b"\r\n")
    chunks: List[bytes] = []
    for line in f:
        if line.startswith(b">"):
            if True:
                seq = CODE_LUT[np.frombuffer(b"".join(chunks), np.uint8)]
                yield ReadRec(name, seq, b"I" * len(seq))
            name = line[1:].rstrip(b"\r\n")
            chunks = []
        else:
            chunks.append(line.strip())
    seq = CODE_LUT[np.frombuffer(b"".join(chunks), np.uint8)]
    yield ReadRec(name, seq, b"I" * len(seq))


def _read_fastq(f, first: bytes) -> Iterator[ReadRec]:
    line = first
    while line:
        name = line[1:].rstrip(b"\r\n")
        seq_line = f.readline().strip()
        f.readline()  # +
        qual_line = f.readline().strip()
        seq = CODE_LUT[np.frombuffer(seq_line, np.uint8)]
        yield ReadRec(name, seq, bytes(qual_line))
        line = f.readline()


def read_batch(paths: List[str], limit: Optional[int] = None) -> List[ReadRec]:
    out: List[ReadRec] = []
    for p in paths:
        for r in read_fastx(p):
            out.append(r)
            if limit and len(out) >= limit:
                return out
    return out
