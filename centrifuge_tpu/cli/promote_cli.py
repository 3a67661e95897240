"""`centrifuge-promote` CLI (the reference's Perl script).

Re-maps each classification row's taxID to the requested rank (walking
up the taxonomy), or to the per-read LCA of multiple assignments when
rank is 'lca' (centrifuge-promote:12-175).
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="centrifuge-promote", allow_abbrev=False)
    p.add_argument("index", metavar="<index>")
    p.add_argument("input", metavar="<classification.tsv>",
                   help="Centrifuge output file ('-' for stdin)")
    p.add_argument("rank", metavar="<rank>",
                   help="Target rank (e.g. species, genus) or 'lca'")
    return p


def run(argv: List[str]) -> int:
    args = make_parser().parse_args(argv)
    from ..index.cf_io import load_cf_index
    from ..index.taxonomy import rank_id

    idx = load_cf_index(args.index, load_sa_sample=False)
    tree = idx.taxonomy.tree

    def parent(t: int) -> int:
        node = tree.get(t)
        return node.parent if node else t

    def at_rank(t: int, rank: int) -> int:
        seen = set()
        while t not in seen:
            seen.add(t)
            node = tree.get(t)
            if node is None:
                return t
            if node.rank == rank:
                return t
            if node.parent == t:
                return t
            t = node.parent
        return t

    def lca(a: int, b: int) -> int:
        if a == 0:
            return b
        if b == 0:
            return a
        apath = set()
        t = a
        while t not in apath:
            apath.add(t)
            if parent(t) == t:
                break
            t = parent(t)
        t = b
        while t not in apath:
            if parent(t) == t:
                return 1
            t = parent(t)
        return t

    f = sys.stdin if args.input == "-" else open(args.input)
    header = f.readline().rstrip("\n")
    cols = header.split("\t")
    col = {c: i for i, c in enumerate(cols)}
    print(header)

    if args.rank == "lca":
        pending: List[List[str]] = []

        def flush():
            if not pending:
                return
            t = 0
            for row in pending:
                t = lca(t, int(row[col["taxID"]].split(".")[0]))
            row = list(pending[0])
            row[col["taxID"]] = str(t)
            if "numMatches" in col:
                row[col["numMatches"]] = "1"
            print("\t".join(row))
            pending.clear()

        prev = None
        for line in f:
            parts = line.rstrip("\n").split("\t")
            rid = parts[col["readID"]]
            if prev is not None and rid != prev:
                flush()
            pending.append(parts)
            prev = rid
        flush()
    else:
        rank = rank_id(args.rank)
        for line in f:
            parts = line.rstrip("\n").split("\t")
            tid = int(parts[col["taxID"]].split(".")[0])
            parts[col["taxID"]] = str(at_rank(tid, rank))
            print("\t".join(parts))
    if f is not sys.stdin:
        f.close()
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))
