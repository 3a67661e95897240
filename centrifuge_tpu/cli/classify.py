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
    p.add_argument("-x", dest="index", required=True, metavar="<cf-idx>",
                   help="Index filename prefix (minus .X.cf)")
    p.add_argument("-U", dest="unpaired", metavar="<r>",
                   help="Comma-separated unpaired read files")
    p.add_argument("-1", dest="mates1", metavar="<m1>",
                   help="Comma-separated mate-1 files")
    p.add_argument("-2", dest="mates2", metavar="<m2>",
                   help="Comma-separated mate-2 files")
    p.add_argument("-S", dest="output", default="-", metavar="<filename>",
                   help="Classification output file (default: stdout)")
    p.add_argument("--report-file", default="centrifuge_report.tsv",
                   metavar="<filename>", help="Species report file")
    p.add_argument("-k", dest="khits", type=int, default=5, metavar="<int>",
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
    p.add_argument("-F", dest="fasta_cont", metavar="k:<int>,i:<int>",
                   help="Classify consecutive k-mers of the input seqs")
    p.add_argument("--un", dest="un_file", metavar="<path>",
                   help="Write unclassified reads to <path>")
    p.add_argument("--al", dest="al_file", metavar="<path>",
                   help="Write classified reads to <path>")
    p.add_argument("-u", "--upto", dest="upto", type=int, default=0,
                   metavar="<int>", help="Stop after the first <int> reads")
    p.add_argument("-s", "--skip", dest="skip", type=int, default=0,
                   metavar="<int>", help="Skip the first <int> reads")
    p.add_argument("-5", "--trim5", dest="trim5", type=int, default=0,
                   metavar="<int>", help="Trim <int> bases from 5' end")
    p.add_argument("-3", "--trim3", dest="trim3", type=int, default=0,
                   metavar="<int>", help="Trim <int> bases from 3' end")
    p.add_argument("-p", "--threads", dest="threads", type=int, default=1,
                   metavar="<int>", help="Accepted for compatibility; the "
                   "device engine is batch-parallel")
    p.add_argument("--batch-size", type=int, default=2048, metavar="<int>",
                   help="Reads per device batch")
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
    p.add_argument("--met-file", metavar="<path>",
                   help="Write interval metrics TSV to <path>")
    p.add_argument("--met-stderr", action="store_true",
                   help="Write interval metrics to stderr")
    p.add_argument("--met", type=int, default=1, metavar="<int>",
                   help="Metrics emission interval in seconds (default 1)")
    p.add_argument("--engine", default="tpu", choices=["tpu", "oracle"],
                   help="Device batch engine (tpu) or numpy oracle")
    p.add_argument("--version", action="store_true")
    p.add_argument("reads", nargs="*", help="Positional read files "
                   "(same as -U) for wrapper compatibility")
    return p


def _split(arg: Optional[str]) -> List[str]:
    return [a for a in (arg or "").split(",") if a]


def _parse_taxids(arg: str) -> Tuple[int, ...]:
    return tuple(int(t) for t in arg.split(",") if t)


def _trim(rec, trim5: int, trim3: int):
    if trim5 == 0 and trim3 == 0:
        return rec
    from ..io.fastx import ReadRec
    n = len(rec.seq)
    lo = min(trim5, n)
    hi = max(lo, n - trim3)
    return ReadRec(rec.name, rec.seq[lo:hi], rec.qual[lo:hi])


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
    from ..io.fastx import (read_fasta_continuous, read_fastx, read_qseq,
                            read_raw, read_tabbed)
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
    cls_cfg = ClassifierConfig(
        khits=args.khits,
        min_hitlen=max(args.min_hitlen, 16),
        tree_traverse=not args.no_traverse,
        classification_rank=args.classification_rank,
        host_taxids=_parse_taxids(args.host_taxids),
        exclude_taxids=_parse_taxids(args.exclude_taxids),
    )
    cfg = PipelineConfig(classifier=cls_cfg, seed=args.seed, columns=columns)

    if args.engine == "tpu":
        from ..classify.tpu_pipeline import TPUClassificationPipeline
        pipe = TPUClassificationPipeline(idx, cfg)
    else:
        from ..ops.fm_numpy import FMOracle
        pipe = ClassificationPipeline(idx, FMOracle(idx), cfg)

    if args.sample_sheet:
        return _run_sample_sheet(args, pipe)

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    out.write(pipe.formatter.header() + "\n")

    unpaired = _split(args.unpaired) + list(args.reads)
    m1 = _split(args.mates1)
    m2 = _split(args.mates2)
    if not unpaired and not m1:
        print("Error: must specify -U, -1/-2, or positional read files",
              file=sys.stderr)
        return 1
    if len(m1) != len(m2):
        print("Error: -1 and -2 must have the same number of files",
              file=sys.stderr)
        return 1

    skip = args.skip
    budget = args.upto if args.upto > 0 else None
    nread = 0

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
            return read_qseq(path)
        if args.fasta_cont:
            opts = dict(kv.split(":") for kv in args.fasta_cont.split(","))
            return read_fasta_continuous(path, int(opts.get("k", 50)),
                                         int(opts.get("i", 1)))
        return read_fastx(path)

    def reads_iter(paths):
        nonlocal skip, nread
        for path in paths:
            for rec in _source(path):
                if skip > 0:
                    skip -= 1
                    continue
                if budget is not None and nread >= budget:
                    return
                nread += 1
                yield _trim(rec, args.trim5, args.trim3)

    def pairs_iter(p1, p2):
        nonlocal skip, nread
        for f1, f2 in zip(p1, p2):
            it1, it2 = read_fastx(f1), read_fastx(f2)
            for r1 in it1:
                r2 = next(it2, None)
                if r2 is None:
                    break
                if skip > 0:
                    skip -= 1
                    continue
                if budget is not None and nread >= budget:
                    return
                nread += 1
                yield (_trim(r1, args.trim5, args.trim3),
                       _trim(r2, args.trim5, args.trim3))

    def tab12_iter(paths):
        nonlocal skip, nread
        for path in paths:
            for item in read_tabbed(path, paired=True):
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

    # --un/--al read teeing (the Perl wrapper's job in the reference)
    un_f = open(args.un_file, "w") if args.un_file else None
    al_f = open(args.al_file, "w") if args.al_file else None

    def write_rec(f, rec):
        seq = codes_to_str(rec.seq)
        if args.fasta:
            f.write(f">{rec.name.decode()}\n{seq}\n")
        else:
            f.write(f"@{rec.name.decode()}\n{seq}\n+\n{rec.qual.decode()}\n")

    col_rid = columns.index("readID") if "readID" in columns else (
        columns.index("QNAME") if "QNAME" in columns else None)
    col_sid = columns.index("seqID") if "seqID" in columns else (
        columns.index("RNEXT") if "RNEXT" in columns else None)

    def tee(recs_batch, rows):
        if (un_f is None and al_f is None) or col_rid is None \
                or col_sid is None:
            return
        ri = 0
        for rec in recs_batch:
            rec0 = rec[0] if isinstance(rec, tuple) else rec
            rid = format_read_id(rec0.name)
            classified = False
            matched = False
            while ri < len(rows):
                parts = rows[ri].split("\t")
                if parts[col_rid] != rid:
                    break
                if parts[col_sid] != "unclassified":
                    classified = True
                ri += 1
                matched = True
            if not matched:
                continue
            target = al_f if classified else un_f
            if target is not None:
                if isinstance(rec, tuple):
                    for r in rec:
                        if r is not None:
                            write_rec(target, r)
                else:
                    write_rec(target, rec)

    from ..utils.metrics import MetricsEmitter
    met = MetricsEmitter(args.met_file, args.met_stderr, args.met)

    if args.engine == "tpu":
        if un_f is None and al_f is None:
            # fast path: pipelined host/device streaming
            for chunk in pipe.classify_stream_unpaired(
                    batches(unpaired_src, args.batch_size)):
                for row in chunk:
                    out.write(row + "\n")
                met.maybe_emit(pipe.metrics)
        else:
            for batch in batches(unpaired_src, args.batch_size):
                rows = pipe.classify_batch_unpaired(batch)
                for row in rows:
                    out.write(row + "\n")
                tee(batch, rows)
                met.maybe_emit(pipe.metrics)
        pair_src = list(pairs_iter(m1, m2)) if m1 else []
        if args.tab12:
            pair_src += [p for p in tab12_iter(_split(args.tab12))
                         if p[1] is not None]
        if pair_src and un_f is None and al_f is None:
            for rows in pipe.classify_stream_paired(
                    batches(iter(pair_src), args.batch_size)):
                for row in rows:
                    out.write(row + "\n")
                met.maybe_emit(pipe.metrics)
        else:
            for batch in batches(iter(pair_src), args.batch_size):
                rows = pipe.classify_batch_paired(batch)
                for row in rows:
                    out.write(row + "\n")
                tee(batch, rows)
                met.maybe_emit(pipe.metrics)
        met.close(pipe.metrics)
    else:
        for rec in unpaired_src:
            for row in pipe.classify_unpaired(rec):
                out.write(row + "\n")
        if m1:
            for r1, r2 in pairs_iter(m1, m2):
                for row in pipe.classify_paired(r1, r2):
                    out.write(row + "\n")

    for f in (un_f, al_f):
        if f is not None:
            f.close()
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
            if stype == "2":
                it1, it2 = read_fastx(r1), read_fastx(r2)
                pairs = []
                for a in it1:
                    b = next(it2, None)
                    if b is None:
                        break
                    pairs.append((_trim(a, args.trim5, args.trim3),
                                  _trim(b, args.trim5, args.trim3)))
                for i in range(0, len(pairs), args.batch_size):
                    for row in pipe.classify_batch_paired(
                            pairs[i: i + args.batch_size]):
                        out.write(row + "\n")
            else:
                recs = [_trim(r, args.trim5, args.trim3)
                        for r in read_fastx(r1)]
                for chunk in pipe.classify_stream_unpaired(
                        recs[i: i + args.batch_size]
                        for i in range(0, len(recs), args.batch_size)):
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
