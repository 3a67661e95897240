"""End-to-end classification pipeline: reads -> TSV rows + metrics.

Host-side orchestration shared by the numpy oracle backend and the TPU
batch engine. Handles read filters, per-read RNG, result selection, row
formatting, and species metrics accumulation, matching the reference
driver (centrifuge.cpp:2440-2760) and sink (aln_sink.h) byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..index.cf_io import CFIndex
from ..index.taxonomy import rank_string
from ..io.fastx import ReadRec
from ..utils.rng import LCG, gen_read_seed
from .algo import AlnResult, Classifier, ClassifierConfig, select_results

DEFAULT_COLUMNS = ["readID", "seqID", "taxID", "score", "2ndBestScore",
                   "hitLength", "queryLength", "numMatches"]


class SpeciesMetrics:
    """Per-taxon read counts + abundance equivalence classes.

    Mirrors SpeciesMetrics (aln_sink.h:56-507). `cur_ids` accumulates the
    taxIDs of max-score rows until it holds `nresult` entries; the
    reference carries leftovers across reads, and so do we.
    """

    def __init__(self):
        # tid -> [n_reads, sum_score, summed_hit_len, weighted_reads, n_unique]
        self.species_counts: Dict[int, list] = {}
        self.observed: Dict[Tuple[int, ...], int] = {}
        self.cur_ids: List[int] = []
        # tid -> HLL++ sketch of distinct 32-mers in uniquely-assigned
        # reads (aln_sink.h:2349-2357); populated only when kmer counting
        # is enabled (the reference computes it always but never prints it)
        self.species_kmers: Dict[int, object] = {}

    def add_kmers(self, tax_id: int, seq_codes, begin: int, length: int) -> None:
        from ..report.hll import HyperLogLogPlus, kmers_of
        sk = self.species_kmers.get(tax_id)
        if sk is None:
            sk = self.species_kmers[tax_id] = HyperLogLogPlus()
        sk.add(kmers_of(seq_codes[begin: begin + length]))

    def n_distinct_kmers(self, tax_id: int) -> int:
        sk = self.species_kmers.get(tax_id)
        return sk.cardinality() if sk is not None else 0

    def add(self, tax_id: int, score: int, max_score: int,
            summed_hit_len: float, nresult: int) -> None:
        sc = self.species_counts.get(tax_id)
        if sc is None:   # .get avoids setdefault's per-call default list
            sc = self.species_counts[tax_id] = [0, 0, 0.0, 0.0, 0]
        sc[0] += 1
        sc[1] += 1  # the reference adds 1, not the score (aln_sink.h:151)
        sc[3] += 1.0 / nresult
        sc[2] += summed_hit_len
        if nresult == 1:
            sc[4] += 1
        if score >= max_score:
            self.cur_ids.append(tax_id)
            if len(self.cur_ids) == nresult:
                key = tuple(sorted(self.cur_ids))
                self.observed[key] = self.observed.get(key, 0) + 1
                self.cur_ids.clear()

    def merge(self, other: "SpeciesMetrics") -> None:
        for tid, sc in other.species_counts.items():
            mine = self.species_counts.setdefault(tid, [0, 0, 0.0, 0.0, 0])
            for i in range(5):
                mine[i] += sc[i]
        for key, cnt in other.observed.items():
            self.observed[key] = self.observed.get(key, 0) + cnt


def format_tax_id(tid: int) -> str:
    """taxIDs >32 bits print as lo.hi (aln_sink.h:2236-2250)."""
    lo = tid & 0xFFFFFFFF
    hi = tid >> 32
    return f"{lo}.{hi}" if hi > 0 else str(lo)


import re as _re

_READ_ID_RE = _re.compile(rb"[^ \t\r\n\x0b\x0c]*")


def format_read_id(name: bytes) -> str:
    """Strip a trailing /1,/2,/3 and stop at whitespace (aln_sink.h:2202-2217)."""
    n = len(name)
    if n >= 2 and name[n - 2] == 0x2F and name[n - 1] in (0x31, 0x32, 0x33):
        name = name[: n - 2]
    return _READ_ID_RE.match(name).group().decode()


@dataclass
class PipelineConfig:
    classifier: ClassifierConfig = field(default_factory=ClassifierConfig)
    seed: int = 0
    columns: List[str] = field(default_factory=lambda: list(DEFAULT_COLUMNS))
    # N-filter ceiling f(len) = min(2 + 0.1*len, len)  (centrifuge.cpp:425)
    n_ceil_const: float = 2.0
    n_ceil_coef: float = 0.1
    min_read_len: int = 2
    # per-taxon distinct-kmer HLL sketches for unique reads; the
    # reference always computes them but never prints them
    # (centrifuge.cpp:3296-3298 is if(false)'d), so default off for speed
    count_kmers: bool = False
    # --qc-filter: drop reads whose qseq filter flag is '0'
    qc_filter: bool = False
    # --met-read: per-read metrics TSV path (utils.metrics)
    met_read: str = ""
    # native C++ assignment engine (classify/native); falls back to the
    # Python path automatically if the extension cannot build
    use_native: bool = True
    # resolve SA rows with the native host LF walk (native/fmwalk.cpp)
    # instead of the device presolve: per-row early exit beats the
    # device's lockstep max walk and removes the prefetch download.
    # Auto-disabled when the extension cannot build or on sharded/
    # multi-host paths (their resolver keeps SPMD processes in sync).
    host_resolve: bool = True
    # tail-thread overlap: the main thread keeps ALL dispatch/collect
    # jax calls; one worker thread runs the device-free host tail
    # (assignment, resolve, row formatting), its rare extension
    # searches serialized through engine.dev_lock. Byte-identical
    # output (tails run FIFO). The earlier 2-worker design deadlocked
    # the axon tunnel under *concurrent* jax calls; this one never
    # issues two at once.
    threaded_stream: bool = True


def n_filter(seq: np.ndarray, n_ceil_const: float, n_ceil_coef: float) -> bool:
    """True iff the read passes the max-N filter (scoring.cpp:104-117)."""
    maxns = min(int(n_ceil_const + n_ceil_coef * len(seq)), len(seq))
    return int(np.count_nonzero(seq == 4)) <= maxns


def read_passes(rec, cfg: "PipelineConfig") -> bool:
    """All per-mate input filters: N-ceiling, min length, and --qc-filter
    (centrifuge.cpp:2548-2585: filt = nfilt && lenfilt && qcfilt; the QC
    flag comes from the qseq filter field, read.h:356)."""
    return (n_filter(rec.seq, cfg.n_ceil_const, cfg.n_ceil_coef)
            and len(rec.seq) >= cfg.min_read_len
            and (not cfg.qc_filter or rec.filter != b"0"))


def batch_flat_seqs(recs):
    """(flat, lens, offsets) of every rec.seq concatenated once.

    The batched prep/filter/seed passes each need the same concatenated
    code buffer; computing it once per batch and passing it down saves
    two 16k-array np.concatenate calls (~5 ms each at 16k reads)."""
    n = len(recs)
    lens = (np.fromiter((len(r.seq) for r in recs), np.int64, n)
            if n else np.zeros(0, np.int64))
    off = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum(lens, out=off[1:])
    flat = (np.concatenate([r.seq for r in recs]) if n and off[-1]
            else np.zeros(0, np.uint8))
    return flat, lens, off


def batch_read_passes(recs, cfg: "PipelineConfig",
                      flat3=None) -> List[bool]:
    """read_passes over a batch with one numpy pass (the per-read
    count_nonzero calls cost ~8 us each; a batch of 8k reads paid ~60 ms
    in filters alone). `flat3`: optional (flat, lens, offsets) from
    batch_flat_seqs to skip the concatenate."""
    n = len(recs)
    if n == 0:
        return []
    if flat3 is not None:
        flat, lens, _ = flat3
        total = int(flat.shape[0])
    else:
        lens = np.fromiter((len(r.seq) for r in recs), np.int64, n)
        total = int(lens.sum())
        flat = np.concatenate([r.seq for r in recs]) if total else None
    if total:
        # segment sums via an inclusive prefix with a leading 0:
        # counts[i] = cs[end_i] - cs[start_i]; robust to empty segments
        cs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(flat == 4, out=cs[1:])
        ends = np.cumsum(lens)
        counts = cs[ends] - cs[ends - lens]
    else:
        counts = np.zeros(n, dtype=np.int64)
    maxns = np.minimum((cfg.n_ceil_const
                        + cfg.n_ceil_coef * lens).astype(np.int64), lens)
    ok = (counts <= maxns) & (lens >= cfg.min_read_len)
    if cfg.qc_filter:
        qc = np.fromiter((r.filter != b"0" for r in recs), np.bool_, n)
        ok &= qc
    return ok.tolist()


def batch_revcomp(recs, flat3=None) -> List[np.ndarray]:
    """Reverse complements for a batch of ReadRecs as zero-copy views of
    one complemented flat buffer (one table lookup instead of 8k).
    `flat3`: optional (flat, lens, offsets) from batch_flat_seqs."""
    from ..io.fastx import COMP
    if not recs:
        return []
    if flat3 is not None:
        cat, lens, _ = flat3
        flat = COMP[cat] if cat.shape[0] else np.zeros(0, np.uint8)
    else:
        lens = [len(r.seq) for r in recs]
        flat = COMP[np.concatenate([r.seq for r in recs])] if sum(lens) \
            else np.zeros(0, np.uint8)
    out = []
    off = 0
    for ln in lens:
        ln = int(ln)
        out.append(flat[off:off + ln][::-1])
        off += ln
    return out


# column name -> field kind, mirroring col_name_map (centrifuge.cpp:483-518)
_COLUMN_FIELD = {
    "readID": "READ_ID", "seqID": "SEQ_ID",
    "taxLevel": "TAX_RANK", "taxRank": "TAX_RANK",
    "taxID": "TAX_ID", "taxName": "TAX_NAME",
    "score": "SCORE", "2ndBestScore": "SCORE2",
    "hitLength": "HIT_LENGTH", "queryLength": "QUERY_LENGTH",
    "numMatches": "NUM_MATCHES", "readSeq": "SEQ", "readQual": "QUAL",
    # SAM aliases (--out-fmt sam)
    "QNAME": "READ_ID", "FLAG": "ZERO", "RNAME": "TAX_ID", "POS": "ZERO",
    "MAPQ": "ZERO", "CIGAR": "STAR", "RNEXT": "SEQ_ID", "PNEXT": "ZERO",
    "TLEN": "QUERY_LENGTH", "SEQ": "SEQ", "QUAL": "QUAL",
    "SEQ1": "SEQ1", "SEQ2": "SEQ2", "QUAL1": "QUAL1", "QUAL2": "QUAL2",
    "readSeq1": "SEQ1", "readSeq2": "SEQ2",
    "readQual1": "QUAL1", "readQual2": "QUAL2",
}

SAM_COLUMNS = ["QNAME", "FLAG", "RNAME", "POS", "MAPQ", "CIGAR", "RNEXT",
               "PNEXT", "TLEN", "SEQ", "QUAL"]

_CODE_TO_BASE = "ACGTN"


def codes_to_str(seq: np.ndarray) -> str:
    return "".join(_CODE_TO_BASE[min(int(c), 4)] for c in seq)


class ResultFormatter:
    """Formats AlnResults into output TSV rows and updates metrics."""

    def __init__(self, idx: CFIndex, cfg: PipelineConfig):
        self.idx = idx
        self.cfg = cfg
        self.tree = idx.taxonomy.tree
        self._tid_memo: Dict[int, Tuple[bool, str]] = {}

    def header(self) -> str:
        return "\t".join(self.cfg.columns)

    def rows_for_read(self, name: bytes, qlen: int,
                      results: List[AlnResult], secbest: int,
                      spm: SpeciesMetrics,
                      unclassified: bool,
                      reads: Optional[Tuple] = None) -> List[str]:
        """reads: optional (rec1, rec2-or-None) for SEQ/QUAL columns."""
        if (self.cfg.columns == DEFAULT_COLUMNS and not self.cfg.count_kmers
                and (unclassified or not results)):
            # hot unclassified fast path
            spm.add(0, 0, 0, 0.0, 1)
            rid = format_read_id(name)
            return [f"{rid}\tunclassified\t0\t0\t0\t0\t{qlen}\t1"]
        if self.cfg.columns == DEFAULT_COLUMNS and not self.cfg.count_kmers \
                and results and not unclassified:
            # hot default-column fast path
            rid = format_read_id(name)
            nres = len(results)
            rows = []
            memo = self._tid_memo
            for r in results:
                tid = r.tax_id
                info = memo.get(tid)
                if info is None:
                    node = self.tree.get(tid)
                    leaf = node.leaf if node is not None else True
                    tid_s = str(tid) if tid < 0x100000000 \
                        else format_tax_id(tid)
                    info = memo[tid] = (leaf, tid_s)
                leaf, tid_s = info
                seq_id = r.uid if leaf else rank_string(r.tax_rank)
                rows.append(
                    f"{rid}\t{seq_id}\t{tid_s}\t{r.score}\t{secbest}\t"
                    f"{int(r.summed_len)}\t{qlen}\t{nres}")
                spm.add(tid, r.score, r.max_score, r.summed_len, nres)
            return rows
        rows = []
        if unclassified or not results:
            results = [AlnResult(score=0, max_score=0, uid="unclassified",
                                 tax_id=0, tax_rank=0, summed_len=0.0,
                                 read_positions=[(0, 0)], is_fw=True)]
            secbest = 0
        n_results = len(results)
        rid = format_read_id(name)
        rec1 = reads[0] if reads else None
        rec2 = reads[1] if reads and len(reads) > 1 else None
        for r in results:
            node = self.tree.get(r.tax_id)
            leaf = node.leaf if node is not None else True
            seq_id = r.uid if leaf else rank_string(r.tax_rank)
            vals = []
            for col in self.cfg.columns:
                kind = _COLUMN_FIELD.get(col)
                if kind == "READ_ID":
                    vals.append(rid)
                elif kind == "SEQ_ID":
                    vals.append(seq_id)
                elif kind == "TAX_ID":
                    vals.append(format_tax_id(r.tax_id))
                elif kind == "SCORE":
                    vals.append(str(r.score))
                elif kind == "SCORE2":
                    vals.append(str(secbest))
                elif kind == "HIT_LENGTH":
                    vals.append(str(int(r.summed_len)))
                elif kind == "QUERY_LENGTH":
                    vals.append(str(qlen))
                elif kind == "NUM_MATCHES":
                    vals.append(str(n_results))
                elif kind == "TAX_RANK":
                    vals.append(rank_string(r.tax_rank))
                elif kind == "TAX_NAME":
                    vals.append(self.idx.taxonomy.names.get(r.tax_id, ""))
                elif kind == "ZERO":
                    vals.append("0")
                elif kind == "STAR":
                    vals.append("*")
                elif kind == "SEQ":
                    # paired mates join with '_' (aln_sink.h:2307-2310)
                    s1 = codes_to_str(rec1.seq) if rec1 is not None else ""
                    if rec2 is not None:
                        s1 += "_" + codes_to_str(rec2.seq)
                    vals.append(s1)
                elif kind == "QUAL":
                    q1 = rec1.qual.decode() if rec1 is not None else ""
                    if rec2 is not None:
                        q1 += "_" + rec2.qual.decode()
                    vals.append(q1)
                elif kind == "SEQ1":
                    vals.append(codes_to_str(rec1.seq) if rec1 is not None else "")
                elif kind == "SEQ2":
                    vals.append(codes_to_str(rec2.seq) if rec2 is not None else "")
                elif kind == "QUAL1":
                    vals.append(rec1.qual.decode() if rec1 is not None else "")
                elif kind == "QUAL2":
                    vals.append(rec2.qual.decode() if rec2 is not None else "")
                else:
                    vals.append("")
            rows.append("\t".join(vals))
            spm.add(r.tax_id, r.score, r.max_score, r.summed_len, n_results)
            # distinct k-mers only for uniquely-assigned reads
            # (aln_sink.h:2349-2357). The reference reads every position
            # against MATE 1's chosen strand (rd = mate 1 there even for
            # pairs whose positions came from mate 2) -- mirrored here.
            if (self.cfg.count_kmers and n_results == 1
                    and not unclassified and rec1 is not None):
                strand = rec1.seq if r.is_fw else rec1.revcomp()
                for begin, length in r.read_positions:
                    spm.add_kmers(r.tax_id, strand, begin, length)
        return rows


class ClassificationPipeline:
    """Oracle (host) pipeline: classify an iterable of reads."""

    def __init__(self, idx: CFIndex, fm, cfg: Optional[PipelineConfig] = None):
        self.idx = idx
        self.cfg = cfg or PipelineConfig()
        self.classifier = Classifier(idx, fm, self.cfg.classifier)
        self.formatter = ResultFormatter(idx, self.cfg)
        self.spm = SpeciesMetrics()

    def _passes(self, rec: ReadRec) -> bool:
        if len(rec.seq) < self.cfg.min_read_len:
            return False
        return n_filter(rec.seq, self.cfg.n_ceil_const, self.cfg.n_ceil_coef)

    def classify_unpaired(self, rec: ReadRec) -> List[str]:
        if not self._passes(rec):
            return self.formatter.rows_for_read(
                rec.name, len(rec.seq), [], 0, self.spm, unclassified=True,
                reads=(rec,))
        results = self.classifier.classify([(rec.seq, rec.revcomp())], paired=False)
        rnd = LCG(gen_read_seed(rec.seq, rec.qual, rec.name, self.cfg.seed))
        chosen, secbest = select_results(results, self.cfg.classifier.khits, rnd)
        return self.formatter.rows_for_read(
            rec.name, len(rec.seq), chosen, secbest, self.spm,
            unclassified=not chosen, reads=(rec,))

    def classify_paired(self, rec1: ReadRec, rec2: ReadRec) -> List[str]:
        p1, p2 = self._passes(rec1), self._passes(rec2)
        qlen = len(rec1.seq) + len(rec2.seq)
        if not p1 and not p2:
            return self.formatter.rows_for_read(
                rec1.name, qlen, [], 0, self.spm, unclassified=True,
                reads=(rec1, rec2))
        seed1 = gen_read_seed(rec1.seq, rec1.qual, rec1.name, self.cfg.seed)
        if p1 and p2:
            seed2 = gen_read_seed(rec2.seq, rec2.qual, rec2.name, self.cfg.seed)
            rnd = LCG(seed1 ^ seed2)
            mates = [(rec1.seq, rec1.revcomp()), (rec2.seq, rec2.revcomp())]
            results = self.classifier.classify(mates, paired=True)
        else:
            rnd = LCG(seed1)
            rec = rec1 if p1 else rec2
            results = self.classifier.classify([(rec.seq, rec.revcomp())], paired=False)
        chosen, secbest = select_results(results, self.cfg.classifier.khits, rnd)
        return self.formatter.rows_for_read(
            rec1.name, qlen, chosen, secbest, self.spm,
            unclassified=not chosen, reads=(rec1, rec2))
