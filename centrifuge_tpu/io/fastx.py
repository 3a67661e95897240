"""FASTA/FASTQ read input.

Produces (name, seq_codes, qual) tuples with the same conventions as the
reference's pattern sources (pat.cpp): FASTA names keep the full header
line, FASTA quality strings are all 'I', sequences map ACGT->0..3 and
anything else (incl. N) -> 4. Quality strings are normalized to
phred+33 at parse time exactly like the reference (qual.h charToPhred33 /
intToPhred33), so downstream consumers (per-read seed, QUAL column,
read tees) see identical bytes for --phred64/--solexa-quals/--int-quals
inputs.
"""

from __future__ import annotations

import bz2 as _bz2
import gzip
from dataclasses import dataclass, field
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
    filter: bytes = b"1"   # qseq filter flag (read.h:356); '0' = QC fail

    def revcomp(self) -> np.ndarray:
        return COMP[self.seq[::-1]]


# Solexa -> Phred table head (qual.cpp:57 solToPhred[]); identity above 9
_SOL_HEAD = [0, 1, 1, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10]
_SOL_LUT = np.array(_SOL_HEAD + list(range(10, 246)), dtype=np.int32)


def _solexa_to_phred(sol: np.ndarray) -> np.ndarray:
    return np.where(sol < -10, 0, _SOL_LUT[np.clip(sol + 10, 0, 255)])


@dataclass
class QualConfig:
    """Input quality encoding (--phred64/--solexa-quals/--int-quals)."""
    solexa: bool = False
    phred64: bool = False
    int_quals: bool = False

    @property
    def active(self) -> bool:
        return self.solexa or self.phred64 or self.int_quals

    def convert(self, qual: bytes) -> bytes:
        """Normalize a quality string to phred+33 (qual.h:105-171)."""
        if not self.active:
            return qual
        if self.int_quals:
            toks = qual.split()
            vals = np.array([int(t) for t in toks], dtype=np.int32)
            if self.solexa:
                pq = _solexa_to_phred(vals) + 33
            else:
                pq = np.minimum(vals, 93) + 33
            if (pq < 33).any():
                raise ValueError(
                    "Saw negative Phred quality %d."
                    % (int(pq.min()) - 33))
            return pq.astype(np.uint8).tobytes()
        q = np.frombuffer(qual, np.uint8).astype(np.int32)
        if self.solexa:
            cc = _solexa_to_phred(q - 64) + 33
            if (cc < 33).any():
                raise ValueError(
                    "Saw ASCII character %d but expected 64-based Solexa "
                    "qual. Try not specifying --solexa-quals."
                    % int(q[cc < 33][0]))
            q = cc
        elif self.phred64:
            if (q < 64).any():
                raise ValueError(
                    "Saw ASCII character %d but expected 64-based Phred "
                    "qual. Try not specifying "
                    "--solexa1.3-quals/--phred64-quals."
                    % int(q[q < 64][0]))
            q = q - (64 - 33)
        else:
            if (q < 33).any():
                raise ValueError(
                    "Saw ASCII character %d but expected 33-based Phred "
                    "qual." % int(q[q < 33][0]))
        return q.astype(np.uint8).tobytes()


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        return _bz2.open(path, "rb")
    return open(path, "rb")


def read_fastx(path: str, qconf: Optional[QualConfig] = None
               ) -> Iterator[ReadRec]:
    """Iterate reads from a FASTA or FASTQ file (gz/bz2 ok); '-' = stdin."""
    import sys
    f = sys.stdin.buffer if path == "-" else _open(path)
    try:
        first = f.readline()
        if not first:
            return
        if first.startswith(b">"):
            yield from _read_fasta(f, first)
        elif first.startswith(b"@"):
            yield from _read_fastq(f, first, qconf)
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


def _read_fastq(f, first: bytes,
                qconf: Optional[QualConfig] = None) -> Iterator[ReadRec]:
    """4-line FASTQ records; blank lines between records are tolerated,
    CR/LF both handled, and malformed records fail with the reference's
    diagnostics (pat.cpp fastq parse errors) instead of silently
    misparsing."""
    conv = qconf.convert if qconf is not None and qconf.active else None
    line = first
    while line:
        if not line.strip():
            line = f.readline()
            continue
        if not line.startswith(b"@"):
            raise ValueError(
                "Error: reads file does not look like a FASTQ file")
        name = line[1:].rstrip(b"\r\n")
        seq_line = f.readline().strip()
        plus = f.readline()
        if not plus.startswith(b"+"):
            raise ValueError(
                "Error: expected '+' line in FASTQ record for read '%s'"
                % name.decode(errors="replace"))
        qual_line = f.readline().strip()
        seq = CODE_LUT[np.frombuffer(seq_line, np.uint8)]
        qual = bytes(qual_line) if conv is None else conv(bytes(qual_line))
        # length check AFTER conversion: --int-quals lines are
        # space-separated integers, one per base
        if len(qual) != len(seq_line):
            which = ("more" if len(qual) > len(seq_line) else "fewer")
            raise ValueError(
                "Error: Read '%s' has %s quality values than read "
                "characters." % (name.decode(errors="replace"), which))
        yield ReadRec(name, seq, qual)
        line = f.readline()


def read_raw(path: str) -> Iterator[ReadRec]:
    """One sequence per line, no name/quality (-r; pat.h RawPatternSource).
    Reads are named by their 0-based ordinal like the reference."""
    f = sys_stdin() if path == "-" else _open(path)
    try:
        for i, line in enumerate(f):
            seq_bytes = line.strip()
            if not seq_bytes:
                continue
            seq = CODE_LUT[np.frombuffer(seq_bytes, np.uint8)]
            yield ReadRec(str(i).encode(), seq, b"I" * len(seq))
    finally:
        if path != "-":
            f.close()


def read_qseq(path: str, qconf: Optional[QualConfig] = None
              ) -> Iterator[ReadRec]:
    """Illumina qseq format (--qseq; read_qseq.cpp): 11 tab fields,
    name joined from fields 0-6 with '_', seq field 8, qual field 9,
    filter flag field 10 (read_qseq.cpp:282); '.' means N."""
    conv = qconf.convert if qconf is not None and qconf.active else None
    f = sys_stdin() if path == "-" else _open(path)
    try:
        for line in f:
            parts = line.rstrip(b"\r\n").split(b"\t")
            if len(parts) < 11:
                continue
            name = b"_".join(parts[:7])
            seq_bytes = parts[8].replace(b".", b"N")
            seq = CODE_LUT[np.frombuffer(seq_bytes, np.uint8)]
            qual = parts[9] if conv is None else conv(parts[9])
            yield ReadRec(name, seq, qual, parts[10][:1] or b"1")
    finally:
        if path != "-":
            f.close()


def read_tabbed(path: str, paired: bool = False,
                qconf: Optional[QualConfig] = None):
    """Tabbed format (--12): name\\tseq\\tqual (unpaired) or
    name\\tseq1\\tqual1\\tseq2\\tqual2 (paired); 6-field variant has
    per-mate names (pat.h TabbedPatternSource)."""
    conv = qconf.convert if qconf is not None and qconf.active else None

    def q(x):
        return x if conv is None else conv(x)

    f = sys_stdin() if path == "-" else _open(path)
    try:
        for line in f:
            parts = line.rstrip(b"\r\n").split(b"\t")
            if len(parts) < 3:
                continue
            if len(parts) >= 5:
                if len(parts) >= 6:
                    n1, s1, q1, n2, s2, q2 = parts[:6]
                else:
                    n1, s1, q1, s2, q2 = parts[:5]
                    n2 = n1
                r1 = ReadRec(n1, CODE_LUT[np.frombuffer(s1, np.uint8)], q(q1))
                r2 = ReadRec(n2, CODE_LUT[np.frombuffer(s2, np.uint8)], q(q2))
                yield (r1, r2)
            else:
                n1, s1, q1 = parts[:3]
                rec = ReadRec(n1, CODE_LUT[np.frombuffer(s1, np.uint8)],
                              q(q1))
                yield (rec, None) if paired else rec
    finally:
        if path != "-":
            f.close()


def read_fasta_continuous(path: str, length: int, freq: int) -> Iterator[ReadRec]:
    """-F k:<len>,i:<freq>: consecutive length-k windows every i bases
    (pat.h FastaContinuousPatternSource). Window names are
    <seqname>_<offset>."""
    for rec in read_fastx(path):
        n = len(rec.seq)
        pos = 0
        while pos + length <= n:
            yield ReadRec(rec.name.split()[0] + b"_" + str(pos).encode(),
                          rec.seq[pos: pos + length], b"I" * length)
            pos += freq


def sys_stdin():
    import sys
    return sys.stdin.buffer


def read_batch(paths: List[str], limit: Optional[int] = None) -> List[ReadRec]:
    out: List[ReadRec] = []
    for p in paths:
        for r in read_fastx(p):
            out.append(r)
            if limit and len(out) >= limit:
                return out
    return out
