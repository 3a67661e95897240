"""`centrifuge` classification CLI.

Mirrors the reference driver's surface (option table centrifuge.cpp:530-745,
parse switch 959-1494, driver loop 2342-3330) on top of the TPU batch
pipeline. Reads stream through the device engine in large batches; rows are
emitted in input order (the reference's OutputQueue reorder semantics hold
by construction because batches are processed in order on the host).
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List, Optional, Tuple

import numpy as np


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="centrifuge", add_help=True, allow_abbrev=False,
        description="Centrifuge-TPU: metagenomic classifier (TPU-native)")
    p.add_argument("-x", "--index", dest="index", required=True,
                   metavar="<cf-idx>",
                   help="Index filename prefix (minus .X.cf)")
    p.add_argument("-U", "--unpaired", dest="unpaired", metavar="<r>",
                   help="Comma-separated unpaired read files")
    p.add_argument("-1", dest="mates1", metavar="<m1>",
                   help="Comma-separated mate-1 files")
    p.add_argument("-2", dest="mates2", metavar="<m2>",
                   help="Comma-separated mate-2 files")
    p.add_argument("-S", "--output", dest="output", default="-",
                   metavar="<filename>",
                   help="Classification output file (default: stdout)")
    p.add_argument("--report-file", default="centrifuge_report.tsv",
                   metavar="<filename>", help="Species report file")
    p.add_argument("-k", "--khits", dest="khits", type=int, default=5,
                   metavar="<int>",
                   help="Report up to <int> distinct assignments per read")
    p.add_argument("--min-hitlen", type=int, default=22, metavar="<int>",
                   help="Minimum length of partial hits (>=16, default 22)")
    p.add_argument("--min-totallen", type=int, default=0, metavar="<int>")
    p.add_argument("--host-taxids", default="", metavar="<taxids>",
                   help="Comma-separated host taxonomy IDs (preferred)")
    p.add_argument("--exclude-taxids", default="", metavar="<taxids>",
                   help="Comma-separated taxonomy IDs to exclude")
    p.add_argument("--no-traverse", action="store_true",
                   help="Do not traverse up the tree to reduce assignments")
    p.add_argument("--classification-rank", default="strain",
                   metavar="<rank>")
    p.add_argument("--tab-fmt-cols", metavar="<cols>", default=None,
                   help="Columns in the tabular output")
    p.add_argument("--out-fmt", default="tab", choices=["tab", "sam"],
                   help="Output format")
    p.add_argument("--no-abundance", action="store_true",
                   help="Skip abundance (EM) estimation in the report")
    p.add_argument("-q", dest="fastq", action="store_true",
                   help="Inputs are FASTQ (default; auto-detected)")
    p.add_argument("-f", dest="fasta", action="store_true",
                   help="Inputs are FASTA (auto-detected)")
    p.add_argument("-c", dest="cmdline", action="store_true",
                   help="Read sequences are given on the command line")
    p.add_argument("-r", dest="raw", action="store_true",
                   help="Inputs are raw one-sequence-per-line")
    p.add_argument("--qseq", action="store_true",
                   help="Inputs are Illumina qseq files")
    p.add_argument("--12", dest="tab12", metavar="<tab>",
                   help="Comma-separated tabbed (1-2-mates-per-line) files")
    p.add_argument("--tab5", metavar="<files>",
                   help="Comma-separated 5-field tabbed paired files: "
                   "name\\tseq1\\tqual1\\tseq2\\tqual2 "
                   "(centrifuge.cpp:976, pat.h TabbedPatternSource)")
    p.add_argument("--tab6", metavar="<files>",
                   help="Comma-separated 6-field tabbed paired files: "
                   "name1\\tseq1\\tqual1\\tname2\\tseq2\\tqual2 "
                   "(centrifuge.cpp:977)")
    p.add_argument("-F", dest="fasta_cont", metavar="k:<int>,i:<int>",
                   help="Classify consecutive k-mers of the input seqs")
    for kind, what in (("un", "unclassified"), ("al", "classified")):
        p.add_argument(f"--{kind}", dest=f"{kind}_file", metavar="<path>",
                       help=f"Write {what} unpaired reads to <path>")
        p.add_argument(f"--{kind}-gz", dest=f"{kind}_file_gz",
                       metavar="<path>")
        p.add_argument(f"--{kind}-bz2", dest=f"{kind}_file_bz2",
                       metavar="<path>")
        p.add_argument(f"--{kind}-conc", dest=f"{kind}_conc_file",
                       metavar="<path>",
                       help=f"Write {what} paired reads to two mate files "
                       "derived from <path>")
        p.add_argument(f"--{kind}-conc-gz", dest=f"{kind}_conc_file_gz",
                       metavar="<path>")
        p.add_argument(f"--{kind}-conc-bz2", dest=f"{kind}_conc_file_bz2",
                       metavar="<path>")
    p.add_argument("--nofw", action="store_true",
                   help="Accepted for compatibility: the reference stores "
                   "but never consults this flag in the classifier "
                   "(hi_aligner.h:745 is its only write; verified "
                   "output-identical with the reference binary)")
    p.add_argument("--norc", action="store_true",
                   help="Accepted for compatibility (see --nofw)")
    p.add_argument("--qc-filter", action="store_true",
                   help="Filter out reads that are bad according to the "
                   "QSEQ filter field")
    p.add_argument("--n-ceil", default="L,2,0.1", metavar="<func>",
                   help="Max number of Ns allowed as a function of read "
                   "length: 'C,<c>' constant or 'L,<c>,<coef>' linear "
                   "(default L,2,0.1; centrifuge.cpp:425)")
    p.add_argument("--ignore-quals", action="store_true",
                   help="Accepted for compatibility (qualities only "
                   "feed vestigial scoring in the reference classifier)")
    p.add_argument("--phred33", "--phred33-quals", dest="phred33",
                   action="store_true",
                   help="Qualities are Phred+33 (default)")
    p.add_argument("--phred64", "--solexa1.3-quals", "--phred64-quals",
                   dest="phred64",
                   action="store_true", help="Qualities are Phred+64")
    p.add_argument("--solexa-quals", dest="solexa_quals",
                   action="store_true",
                   help="Qualities are from GA Pipeline ver. < 1.3")
    p.add_argument("--int-quals", "--integer-quals", dest="int_quals",
                   action="store_true",
                   help="Qualities are given as space-delimited integers")
    p.add_argument("-u", "--upto", "--qupto", dest="upto", type=int,
                   default=0,
                   metavar="<int>", help="Stop after the first <int> reads")
    p.add_argument("--sample", type=float, default=1.1, metavar="<frac>",
                   help="Classify only a pseudo-random fraction of the "
                   "input reads, decided per read from its seed exactly "
                   "as the reference (centrifuge.cpp:2459-2462; sampled-"
                   "out reads still count against -u, rdid semantics)")
    p.add_argument("--non-deterministic", "--nondeterministic",
                   dest="non_deterministic", action="store_true",
                   help="Re-seed the per-read RNG arbitrarily each run "
                   "(reference: time-seeded per-read draws, "
                   "centrifuge.cpp:2456-2458; here a time-derived global "
                   "seed -- identical duplicate reads share a seed "
                   "within one run, unlike the reference)")
    p.add_argument("-s", "--skip", dest="skip", type=int, default=0,
                   metavar="<int>", help="Skip the first <int> reads")
    p.add_argument("-5", "--trim5", dest="trim5", type=int, default=0,
                   metavar="<int>", help="Trim <int> bases from 5' end")
    p.add_argument("-3", "--trim3", dest="trim3", type=int, default=0,
                   metavar="<int>", help="Trim <int> bases from 3' end")
    p.add_argument("-p", "--threads", dest="threads", type=int, default=1,
                   metavar="<int>", help="Accepted for compatibility; the "
                   "device engine is batch-parallel")
    p.add_argument("--batch-size", type=int, default=16384, metavar="<int>",
                   help="Reads per device batch (large batches amortize "
                        "the search step's fixed per-step cost: 16k reads "
                        "= 32k lanes measured +22%% over 8k)")
    p.add_argument("--seed", type=int, default=0, metavar="<int>")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("-t", "--time", dest="timing", action="store_true")
    p.add_argument("--mm", action="store_true",
                   help="Accepted for compatibility (index always shared)")
    p.add_argument("--shmem", action="store_true",
                   help="Accepted for compatibility")
    p.add_argument("--reorder", action="store_true",
                   help="Accepted for compatibility (output always ordered)")
    p.add_argument("--sample-sheet", metavar="<file>",
                   help="5-column TSV: type(1=single,2=paired), read1, "
                   "read2, classification-out, report-out; one sample per "
                   "line, each classified separately")
    p.add_argument("--file-parallel", action="store_true",
                   help="Accepted for compatibility (samples stream "
                   "through one device pipeline)")
    p.add_argument("--met-file", "--metrics-file", dest="met_file",
                   metavar="<path>",
                   help="Write interval metrics TSV to <path>")
    p.add_argument("--met-stderr", "--metrics-stderr", dest="met_stderr",
                   action="store_true",
                   help="Write interval metrics to stderr")
    p.add_argument("--met", "--metrics", dest="met", type=int, default=1,
                   metavar="<int>",
                   help="Metrics emission interval in seconds (default 1)")
    p.add_argument("--met-read", "--metrics-per-read", dest="met_read",
                   nargs="?", const=True, metavar="<path>",
                   help="Per-read metrics: with <path>, one row per read "
                   "to that file; bare (reference arity, "
                   "centrifuge.cpp:546-547) rows go to --met-file / "
                   "stderr")
    p.add_argument("--engine", default="tpu", choices=["tpu", "oracle"],
                   help="Device batch engine (tpu) or numpy oracle")
    p.add_argument("--version", action="store_true")
    p.add_argument("--usage", action="help",
                   help="Print this help (reference alias)")
    p.add_argument("reads", nargs="*", help="Positional read files "
                   "(same as -U) for wrapper compatibility")
    _add_compat_noops(p)
    return p


# The remaining bowtie2-inherited options the reference parses
# (centrifuge.cpp:530-706) but that cannot affect classification output:
# alignment-policy / DP / seed-extension / SAM / cache tuning consumed
# only by the HISAT2 alignment machinery the classifier never invokes.
# Parsed with the reference's arity so any reference command line runs
# unmodified; values are ignored.
_NOOP_FLAGS0 = [
    "1mm-upfront", "454", "all", "arg-desc", "bwa-sw-like", "cache",
    "contain", "dovetail", "end-to-end", "exact-upfront", "ff", "filepar",
    "fr", "fullref", "fuzzy", "hadoopout", "ion-torrent", "local",
    "mapq-extra", "mapq-print-inputs", "mmsweep", "no-1mm-upfront",
    "no-cache", "no-contain", "no-discordant", "no-dovetail",
    "no-exact-upfront", "no-extend", "no-mixed", "no-overlap",
    "no-score-priority", "no-sse8", "no-unal", "no-ungapped",
    "omit-sec-seq", "overhang", "overlap", "passthrough", "pause",
    "read-times", "refidx", "rf", "sanity", "scan-narrowed", "seed-summ",
    "seed-summary", "separator", "show-rand-seed", "sse8", "startverbose",
    "test-25", "tri", "ungapped", "verbose",
]
_NOOP_FLAGS1 = [
    "1mm-minlen", "cachelim", "cachesz", "cp-ival", "cp-min", "desc-exp",
    "desc-fmops", "desc-kb", "desc-landing", "dp-fail-streak", "dp-fails",
    "dpad", "ee-fail-streak", "extends", "fail-streak", "gbar",
    "local-seed-cache-sz", "ma", "mapq-v", "maxins", "min-score", "minins",
    "mp", "multiseed", "np", "orig", "partition", "policy", "preset",
    "rdg", "rfg", "score-min", "seed-boost", "seed-cache-sz", "seed-off",
    "seed-rounds", "seedival", "seedlen", "seedmms", "tighten",
    "ug-fail-streak", "ug-fails", "wrapper",
]
# short bowtie2 leftovers (short_options, centrifuge.cpp:530): no-arg
# b/z/a/C; with-arg P/w/M/I/X/N/i/L/g/O/D/R/v
_NOOP_SHORT0 = ["-b", "-z", "-a", "-C"]
_NOOP_SHORT1 = ["-P", "-w", "-M", "-I", "-X", "-N", "-i", "-L", "-g",
                "-O", "-D", "-R", "-v"]
# --quals/-Q and --sra-acc also parse, but warn: they WOULD change
# behavior in the reference and are not implemented here


def _noop_dest(f: str) -> str:
    d = f.replace("-", "_").replace(".", "_")
    return "noop_n" + d if d[0].isdigit() else "noop_" + d


def _add_compat_noops(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("reference-compatibility no-ops")
    for f in _NOOP_FLAGS0:
        g.add_argument("--" + f, action="store_true", dest=_noop_dest(f),
                       help=argparse.SUPPRESS)
    for f in _NOOP_FLAGS1:
        g.add_argument("--" + f, metavar="<x>", dest=_noop_dest(f),
                       help=argparse.SUPPRESS)
    for f in _NOOP_SHORT0:
        g.add_argument(f, action="store_true",
                       dest="noop_short_" + f[1:], help=argparse.SUPPRESS)
    for f in _NOOP_SHORT1:
        g.add_argument(f, metavar="<x>",
                       dest="noop_short_" + f[1:], help=argparse.SUPPRESS)
    g.add_argument("--quals", "-Q", metavar="<files>",
                   dest="unsup_quals", help=argparse.SUPPRESS)
    g.add_argument("--sra-acc", metavar="<acc>",
                   dest="unsup_sra_acc", help=argparse.SUPPRESS)


def _split(arg: Optional[str]) -> List[str]:
    return [a for a in (arg or "").split(",") if a]


def _parse_taxids(arg: str) -> Tuple[int, ...]:
    return tuple(int(t) for t in arg.split(",") if t)


def _parse_nceil(arg: str) -> Tuple[float, float]:
    """SimpleFunc subset for --n-ceil (centrifuge.cpp:1323-1347):
    'C,<c>' / 'L,<c>,<coef>' / '<c>' / '<c>,<coef>'."""
    parts = [a for a in arg.split(",") if a != ""]
    if not parts:
        raise SystemExit(
            "Error: expected at least one argument to --n-ceil option")
    if parts[0].upper() in ("C", "L", "S", "G"):
        kind = parts[0].upper()
        vals = [float(v) for v in parts[1:]]
        if kind == "C":
            return (vals[0] if vals else 0.0), 0.0
        if kind == "L":
            return (vals[0] if vals else 0.0), (
                vals[1] if len(vals) > 1 else 0.0)
        raise SystemExit(
            f"Error: unsupported --n-ceil function type {kind}")
    vals = [float(v) for v in parts]
    if len(vals) == 1:
        return vals[0], 0.0
    return vals[0], vals[1]


def _trim(rec, trim5: int, trim3: int):
    if trim5 == 0 and trim3 == 0:
        return rec
    from ..io.fastx import ReadRec
    n = len(rec.seq)
    lo = min(trim5, n)
    hi = max(lo, n - trim3)
    return ReadRec(rec.name, rec.seq[lo:hi], rec.qual[lo:hi], rec.filter)


class ReadTee:
    """Row-level read teeing, byte-compatible with the Perl wrapper
    (centrifuge:874-928): --un/--al take unpaired rows, --un-conc/
    --al-conc take paired rows (detected by '_' in the readSeq column,
    which joins mates), each with -gz/-bz2 compressed variants. Reads
    are re-emitted as FASTQ when a readQual column exists, else FASTA,
    once per OUTPUT ROW (a read with k assignments appears k times --
    reference behaviour)."""

    KINDS = ("un", "al", "un-conc", "al-conc")

    def __init__(self, args):
        self.specs = {}
        for kind in self.KINDS:
            base = kind.replace("-", "_") + "_file"
            for suff, comp in (("", None), ("_gz", "gz"), ("_bz2", "bz2")):
                path = getattr(args, base + suff, None)
                if path:
                    self.specs[kind] = (path, comp)
        self.active = bool(self.specs)
        self.fhs = {}
        self.seq_i = self.qual_i = self.rid_i = None

    @staticmethod
    def _mate_names(path: str):
        """Derive the two mate filenames (centrifuge:735-747)."""
        import os.path as osp
        d, fn = osp.split(path)
        if "%" in fn:
            f1, f2 = fn.replace("%", "1"), fn.replace("%", "2")
        elif "." in fn.lstrip("."):
            stem, ext = fn.rsplit(".", 1)
            f1, f2 = f"{stem}.1.{ext}", f"{stem}.2.{ext}"
        else:
            f1, f2 = fn + ".1", fn + ".2"
        return osp.join(d, f1), osp.join(d, f2)

    @staticmethod
    def _open(path: str, comp):
        if comp == "gz":
            import gzip
            return gzip.open(path, "wt")
        if comp == "bz2":
            import bz2
            return bz2.open(path, "wt")
        return open(path, "w")

    def open_files(self, columns: List[str]) -> None:
        if not self.active:
            return
        # first column whose name CONTAINS the key, like the wrapper's
        # regex match (centrifuge:788-801)
        for i, c in enumerate(columns):
            if "readSeq" in c and self.seq_i is None:
                self.seq_i = i
            elif "readQual" in c and self.qual_i is None:
                self.qual_i = i
            elif "readID" in c and self.rid_i is None:
                self.rid_i = i
        if self.seq_i is None:
            print("Must use readSeq in --tab-fmt-cols in order to output "
                  "unaligned reads.", file=sys.stderr)
            raise SystemExit(1)
        for kind, (path, comp) in self.specs.items():
            if kind.endswith("-conc"):
                f1, f2 = self._mate_names(path)
                self.fhs[kind] = (self._open(f1, comp), self._open(f2, comp))
            else:
                self.fhs[kind] = self._open(path, comp)

    def _fmt(self, rid: str, seq: str, qual) -> str:
        if self.qual_i is not None:
            return f"@{rid}\n{seq}\n+\n{qual}\n"
        return f">{rid}\n{seq}\n"

    def process(self, row: str) -> None:
        if not self.fhs:
            return
        cols = row.split("\t")
        seq = cols[self.seq_i]
        unal = "unclassified" in row
        rid = cols[self.rid_i] if self.rid_i is not None else ""
        if "_" in seq:
            key = "un-conc" if unal else "al-conc"
            fhs = self.fhs.get(key)
            if fhs is not None:
                s1, s2 = seq.split("_", 1)
                if self.qual_i is not None:
                    q = cols[self.qual_i]
                    q1, q2 = q[: len(s1)], q[len(s1) + 1:]
                else:
                    q1 = q2 = None
                fhs[0].write(self._fmt(rid, s1, q1))
                fhs[1].write(self._fmt(rid, s2, q2))
        else:
            fh = self.fhs.get("un" if unal else "al")
            if fh is not None:
                q = cols[self.qual_i] if self.qual_i is not None else None
                fh.write(self._fmt(rid, seq, q))

    def close(self) -> None:
        for v in self.fhs.values():
            if isinstance(v, tuple):
                v[0].close()
                v[1].close()
            else:
                v.close()


def run(argv: List[str]) -> int:
    args = make_parser().parse_args(argv)
    if args.version:
        from .. import __version__
        print(f"centrifuge-class (centrifuge-tpu) version {__version__}")
        return 0

    from ..classify.algo import ClassifierConfig
    from ..classify.pipeline import (DEFAULT_COLUMNS, ClassificationPipeline,
                                     PipelineConfig, codes_to_str,
                                     format_read_id)
    from ..index.cf_io import load_cf_index
    from ..io.fastx import (QualConfig, read_fasta_continuous, read_fastx,
                            read_qseq, read_raw, read_tabbed)
    from ..report.writers import write_report

    t_start = time.time()
    idx = load_cf_index(args.index)
    if idx.bwt_len >= (1 << 31):
        # wide path: indexes over 2^31 bases need 64-bit device rows
        import jax
        jax.config.update("jax_enable_x64", True)

    from ..classify.pipeline import SAM_COLUMNS
    columns = list(SAM_COLUMNS) if args.out_fmt == "sam" \
        else list(DEFAULT_COLUMNS)
    if args.tab_fmt_cols:
        columns = [c for c in args.tab_fmt_cols.split(",") if c]
    # read-tee handling mirrors the Perl wrapper: when any --un/--al
    # family option is set, readSeq/readQual are appended to the column
    # list and stripped from the written rows afterwards
    # (centrifuge:305-338, RemoveSeqCols centrifuge:618-626)
    tee = ReadTee(args)
    strip_cols = 0
    if tee.active and not any("readSeq" in c for c in columns):
        columns = columns + ["readSeq", "readQual"]
        strip_cols = 2

    cls_cfg = ClassifierConfig(
        khits=args.khits,
        min_hitlen=max(args.min_hitlen, 16),
        tree_traverse=not args.no_traverse,
        classification_rank=args.classification_rank,
        host_taxids=_parse_taxids(args.host_taxids),
        exclude_taxids=_parse_taxids(args.exclude_taxids),
    )
    n_const, n_coef = _parse_nceil(args.n_ceil)
    run_seed = args.seed
    if args.non_deterministic:
        # reference: rndArb.init((uint32_t)time(0)) and per-read draws
        # (centrifuge.cpp:2456-2458); here one time-derived global seed
        run_seed = int(time.time()) & 0xFFFFFFFF
    met_read_path = args.met_read if isinstance(args.met_read, str) else ""
    cfg = PipelineConfig(classifier=cls_cfg, seed=run_seed, columns=columns,
                         qc_filter=args.qc_filter,
                         met_read=met_read_path,
                         n_ceil_const=n_const, n_ceil_coef=n_coef)
    qconf = QualConfig(solexa=args.solexa_quals, phred64=args.phred64,
                       int_quals=args.int_quals)
    if args.unsup_quals:
        print("Warning: -Q/--quals (separate quality files) is not "
              "supported; qualities default to 'I'", file=sys.stderr)
    if args.unsup_sra_acc:
        print("Warning: --sra-acc (SRA input) is not supported",
              file=sys.stderr)

    if args.engine == "tpu":
        from ..classify.tpu_pipeline import TPUClassificationPipeline
        pipe = TPUClassificationPipeline(idx, cfg)
    else:
        from ..ops.fm_numpy import FMOracle
        pipe = ClassificationPipeline(idx, FMOracle(idx), cfg)

    if args.sample_sheet:
        return _run_sample_sheet(args, pipe)

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    header = pipe.formatter.header()
    if strip_cols:
        header = header.rsplit("\t", strip_cols)[0]
    out.write(header + "\n")

    unpaired = _split(args.unpaired) + list(args.reads)
    m1 = _split(args.mates1)
    m2 = _split(args.mates2)
    if not unpaired and not m1 and not args.tab12 \
            and not args.tab5 and not args.tab6:
        print("Error: must specify -U, -1/-2, --12, --tab5/--tab6, or "
              "positional read files", file=sys.stderr)
        return 1
    if len(m1) != len(m2):
        print("Error: -1 and -2 must have the same number of files",
              file=sys.stderr)
        return 1

    skip = args.skip
    budget = args.upto if args.upto > 0 else None
    nread = 0

    sample_keep = None
    if args.sample < 1.0:
        # reference gate (centrifuge.cpp:2459-2462):
        #   rnd.init(ROTL(seed, 2)); sample = rnd.nextFloat() < frac
        # where ROTL's macro args are swapped (#define ROTL(n, x),
        # centrifuge.cpp:2229), so it actually rotates the CONSTANT 2
        # left by `seed` bits -- x86 shifts truncate the count mod 32.
        # nextFloat() = nextU32() / 0xffffffff in float32.
        from ..utils.rng import LCG, gen_read_seed
        frac32 = np.float32(args.sample)

        def sample_keep(rec):
            s = int(gen_read_seed(rec.seq, rec.qual, rec.name, run_seed))
            init = ((2 << (s & 31)) | (2 >> ((32 - s) & 31))) & 0xFFFFFFFF
            u = LCG(init).next_u32()
            return np.float32(u) / np.float32(0xFFFFFFFF) < frac32

    def batches(it, size):
        buf = []
        for x in it:
            buf.append(x)
            if len(buf) >= size:
                yield buf
                buf = []
        if buf:
            yield buf

    def _source(path):
        if args.raw:
            return read_raw(path)
        if args.qseq:
            return read_qseq(path, qconf)
        if args.fasta_cont:
            opts = dict(kv.split(":") for kv in args.fasta_cont.split(","))
            return read_fasta_continuous(path, int(opts.get("k", 50)),
                                         int(opts.get("i", 1)))
        return read_fastx(path, qconf)

    def reads_iter(paths):
        nonlocal skip, nread
        for path in paths:
            for rec in _source(path):
                if skip > 0:
                    skip -= 1
                    continue
                if budget is not None and nread >= budget:
                    return
                nread += 1  # sampled-out reads still consume -u (rdid)
                rec = _trim(rec, args.trim5, args.trim3)
                if sample_keep is not None and not sample_keep(rec):
                    continue
                yield rec

    def pairs_iter(p1, p2):
        nonlocal skip, nread
        for f1, f2 in zip(p1, p2):
            it1, it2 = read_fastx(f1, qconf), read_fastx(f2, qconf)
            for r1 in it1:
                r2 = next(it2, None)
                if r2 is None:
                    print("Error, fewer reads in file specified with -2 "
                          "than in file specified with -1", file=sys.stderr)
                    raise SystemExit(1)
                if skip > 0:
                    skip -= 1
                    continue
                if budget is not None and nread >= budget:
                    return
                nread += 1
                r1 = _trim(r1, args.trim5, args.trim3)
                r2 = _trim(r2, args.trim5, args.trim3)
                # sampling keys on the mate-1 (bufa) seed
                if sample_keep is not None and not sample_keep(r1):
                    continue
                yield (r1, r2)
            if next(it2, None) is not None:
                print("Error, fewer reads in file specified with -1 than "
                      "in file specified with -2", file=sys.stderr)
                raise SystemExit(1)

    def tab12_iter(paths):
        nonlocal skip, nread
        for path in paths:
            for item in read_tabbed(path, paired=True, qconf=qconf):
                if skip > 0:
                    skip -= 1
                    continue
                if budget is not None and nread >= budget:
                    return
                nread += 1
                r1, r2 = item
                r1 = _trim(r1, args.trim5, args.trim3)
                if r2 is not None:
                    r2 = _trim(r2, args.trim5, args.trim3)
                if sample_keep is not None and not sample_keep(r1):
                    continue
                yield (r1, r2)

    if args.cmdline:
        # -c: sequences are on the command line, one read per token
        from ..io.fastx import CODE_LUT, ReadRec
        recs = [ReadRec(str(i).encode(),
                        CODE_LUT[np.frombuffer(s.encode(), np.uint8)],
                        b"I" * len(s))
                for i, s in enumerate(unpaired)]
        unpaired_src = iter(recs)
    else:
        unpaired_src = reads_iter(unpaired) if unpaired else iter(())

    tee.open_files(columns)

    def emit(row):
        tee.process(row)
        if strip_cols:
            row = row.rsplit("\t", strip_cols)[0]
        out.write(row + "\n")

    from ..utils.metrics import MetricsEmitter
    met = MetricsEmitter(args.met_file, args.met_stderr, args.met)
    if args.met_read is True:
        # bare --met-read/--metrics-per-read (reference arity): per-read
        # rows ride the --met-file / --met-stderr sinks
        from ..utils.metrics import PerReadMetricsWriter
        sink = met.fh if met.fh is not None else sys.stderr
        pipe.met_read = PerReadMetricsWriter(stream=sink)

    if args.engine == "tpu":
        # pipelined host/device streaming; the tee consumes output rows
        # (wrapper semantics), so it composes with streaming
        for chunk in pipe.classify_stream_unpaired(
                batches(unpaired_src, args.batch_size)):
            for row in chunk:
                emit(row)
            met.maybe_emit(pipe.metrics)
        import itertools
        pair_src = pairs_iter(m1, m2) if m1 else iter(())
        if args.tab12:
            # single-mate tabbed rows classify as unpaired reads in
            # input order (pat.h TabbedPatternSource)
            pair_src = itertools.chain(pair_src,
                                       tab12_iter(_split(args.tab12)))
        for tabf in (args.tab5, args.tab6):
            # --tab5/--tab6 rows are always paired (TAB_MATE5/6,
            # centrifuge.cpp:976-977); field count distinguishes the
            # shared-name 5-field from the per-mate-name 6-field form
            if tabf:
                pair_src = itertools.chain(pair_src,
                                           tab12_iter(_split(tabf)))
        for rows in pipe.classify_stream_paired(
                batches(pair_src, args.batch_size)):
            for row in rows:
                emit(row)
            met.maybe_emit(pipe.metrics)
        met.close(pipe.metrics)
    else:
        for rec in unpaired_src:
            for row in pipe.classify_unpaired(rec):
                emit(row)
        if m1:
            for r1, r2 in pairs_iter(m1, m2):
                for row in pipe.classify_paired(r1, r2):
                    emit(row)

    tee.close()
    if getattr(pipe, "met_read", None) is not None:
        pipe.met_read.close()
    if out is not sys.stdout:
        out.close()

    if args.report_file:
        print(f"report file {args.report_file}", file=sys.stderr)
        t0 = time.time()
        write_report(args.report_file, idx, pipe.spm,
                     abundance_analysis=not args.no_abundance,
                     verbose_stderr=True)
        if not args.no_abundance:
            el = time.time() - t0
            hh, rem = divmod(int(el), 3600)
            mm, ss = divmod(rem, 60)
            print(f"Calculating abundance: {hh:02d}:{mm:02d}:{ss:02d}",
                  file=sys.stderr)

    if args.timing:
        el = time.time() - t_start
        print(f"Overall time: {el:.2f}s ({nread} reads, "
              f"{nread/max(el,1e-9):.0f} reads/s)", file=sys.stderr)
    return 0


def _run_sample_sheet(args, pipe) -> int:
    """Per-sample classification (the Perl wrapper's --sample-sheet,
    centrifuge:248-330): each line gets its own output + report files and
    independent species metrics; the index stays resident."""
    from ..classify.pipeline import SpeciesMetrics
    from ..io.fastx import read_fastx
    from ..report.writers import write_report

    with open(args.sample_sheet) as f:
        samples = [line.rstrip("\n").split("\t") for line in f
                   if line.strip()]
    for cols in samples:
        if len(cols) != 5:
            print(f"Bad sample sheet line: {cols}", file=sys.stderr)
            return 1

    for cols in samples:
        stype, r1, r2, out_path, report_path = cols
        pipe.spm = SpeciesMetrics()
        with open(out_path, "w") as out:
            out.write(pipe.formatter.header() + "\n")
            def _batches(it):
                buf = []
                for x in it:
                    buf.append(x)
                    if len(buf) >= args.batch_size:
                        yield buf
                        buf = []
                if buf:
                    yield buf

            if stype == "2":
                def _pairs():
                    it1, it2 = read_fastx(r1), read_fastx(r2)
                    for a in it1:
                        b = next(it2, None)
                        if b is None:
                            break
                        yield (_trim(a, args.trim5, args.trim3),
                               _trim(b, args.trim5, args.trim3))
                for rows in pipe.classify_stream_paired(_batches(_pairs())):
                    for row in rows:
                        out.write(row + "\n")
            else:
                recs = (_trim(r, args.trim5, args.trim3)
                        for r in read_fastx(r1))
                for chunk in pipe.classify_stream_unpaired(_batches(recs)):
                    for row in chunk:
                        out.write(row + "\n")
        if report_path:
            print(f"report file {report_path}", file=sys.stderr)
            write_report(report_path, pipe.idx, pipe.spm,
                         abundance_analysis=not args.no_abundance,
                         verbose_stderr=True)
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))
