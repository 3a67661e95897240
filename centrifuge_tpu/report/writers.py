"""Report-file and kreport writers (byte-compatible with the reference)."""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from ..index.cf_io import CFIndex
from ..index.taxonomy import RANK_UNKNOWN, rank_string
from .abundance import calculate_abundance


def fmt_double(x: float) -> str:
    """Format a double like C++ default ostream (6 significant digits)."""
    if x == int(x) and abs(x) < 1e15:
        # C++ prints integral doubles without a decimal point
        s = f"{x:.6g}"
    else:
        s = f"{x:.6g}"
    # match C++ exponent formatting (e+06 etc. already matches %g on linux)
    return s


def write_report(path: str, idx: CFIndex, spm, abundance_analysis: bool = True,
                 verbose_stderr: bool = False) -> None:
    """Write centrifuge_report.tsv (centrifuge.cpp:3230-3318)."""
    abundance_len: Dict[int, float] = {}
    if abundance_analysis:
        stats: Dict[str, float] = {}
        _, abundance_len = calculate_abundance(idx.taxonomy, spm.observed,
                                               stats=stats)
        if verbose_stderr:
            import sys
            print("Number of iterations in EM algorithm: "
                  f"{stats.get('num_iteration', 0)}", file=sys.stderr)
            print("Probability diff. (P - P_prev) in the last iteration: "
                  f"{stats.get('diff', 0.0):.6g}", file=sys.stderr)
    tax = idx.taxonomy
    with open(path, "w") as f:
        f.write("name\ttaxID\ttaxRank\tgenomeSize\tnumReads\tnumUniqueReads\tabundance\n")
        for tid in sorted(spm.species_counts):
            if tid == 0:
                continue
            sc = spm.species_counts[tid]
            name = tax.names.get(tid, str(tid))
            node = tax.tree.get(tid)
            rank = node.rank if node is not None else 0
            leaf = node.leaf if node is not None else False
            rank_str = "leaf" if (rank == RANK_UNKNOWN and leaf) else rank_string(rank)
            gsize = tax.sizes.get(tid, 0)
            ab = abundance_len.get(tid)
            ab_str = fmt_double(ab) if ab is not None else "0.0"
            f.write(f"{name}\t{tid}\t{rank_str}\t{gsize}\t{sc[0]}\t{sc[4]}\t{ab_str}\n")


def kreport_lines(idx: CFIndex, classification_rows: Iterable[str],
                  no_lca: bool = False, min_score: Optional[int] = None,
                  min_length: Optional[int] = None,
                  show_zeros: bool = False,
                  precounted: Optional[Dict[int, float]] = None,
                  precount_total: Optional[float] = None) -> List[str]:
    """Generate a Kraken-style report from classification TSV lines.

    Reimplements the centrifuge-kreport script (centrifuge-kreport:65-229):
    per-read LCA of multi-assignments (default), clade rollup via DFS over
    the taxonomy with children in ascending-taxID order and siblings
    reported by descending clade count (stable).
    """
    tax = idx.taxonomy
    parent_map: Dict[int, int] = {}
    child_lists: Dict[int, List[int]] = {}
    rank_map: Dict[int, str] = {}
    name_map: Dict[int, str] = {}
    for tid in sorted(tax.tree):
        node = tax.tree[tid]
        parent = 0 if tid == 1 else node.parent
        parent_map[tid] = parent
        child_lists.setdefault(parent, []).append(tid)
        rank_map[tid] = rank_string(node.rank)
        name_map[tid] = tax.names.get(tid, "")
    # names dumped by inspect may include ids missing from the tree
    for tid, name in tax.names.items():
        name_map.setdefault(tid, name)

    def in_tree(tid: int) -> bool:
        a = tid
        while a > 1:
            if a not in parent_map:
                return False
            if a == parent_map[a]:
                break
            a = parent_map[a]
        return True

    def lca(a: int, b: int) -> int:
        if a == 0:
            return b
        if b == 0:
            return a
        if a == b:
            return a
        a_path = set()
        while a >= 1:
            a_path.add(a)
            if a not in parent_map or a == parent_map[a]:
                break
            a = parent_map[a]
        while b > 1:
            if b in a_path:
                return b
            if b not in parent_map or b == parent_map[b]:
                break
            b = parent_map[b]
        return 1

    taxo_counts: Dict[int, float] = {0: 0}
    seq_count = 0.0
    if precounted is not None:
        # --is-count-table mode: taxID -> count rows straight in
        # (centrifuge-kreport:72-78); the caller supplies the per-line
        # total separately because duplicate rows overwrite the dict
        for tid, count in precounted.items():
            taxo_counts[tid] = count
            seq_count += count
        if precount_total is not None:
            seq_count = precount_total
        classification_rows = iter(())
    header: Optional[List[str]] = None
    col: Dict[str, int] = {}
    prev_read = None
    prev_tid = None
    for line in classification_rows:
        line = line.rstrip("\n")
        if header is None:
            header = line.split("\t")
            col = {c: i for i, c in enumerate(header)}
            continue
        parts = line.split("\t")
        read_id = parts[col["readID"]]
        tid_str = parts[col["taxID"]]
        score = float(parts[col["score"]])
        hit_len = float(parts[col["hitLength"]])
        nmatches = float(parts[col["numMatches"]])
        if min_length is not None and hit_len < min_length:
            continue
        if min_score is not None and score < min_score:
            continue
        tid = int(tid_str.split(".")[0]) if "." in tid_str else int(tid_str)
        if not in_tree(tid):
            tid = 1
        if no_lca:
            taxo_counts[tid] = taxo_counts.get(tid, 0) + 1.0 / nmatches
            seq_count += 1.0 / nmatches
        else:
            if prev_read is not None and read_id == prev_read:
                taxo_counts[prev_tid] -= 1
                prev_tid = lca(prev_tid, tid)
                taxo_counts[prev_tid] = taxo_counts.get(prev_tid, 0) + 1
            else:
                taxo_counts[tid] = taxo_counts.get(tid, 0) + 1
                seq_count += 1
                prev_tid = tid
        prev_read = read_id

    clade_counts = dict(taxo_counts)

    def dfs_sum(node: int) -> None:
        for child in child_lists.get(node, []):
            dfs_sum(child)
            clade_counts[node] = clade_counts.get(node, 0) + clade_counts.get(child, 0)

    dfs_sum(1)
    for tid in name_map:
        clade_counts.setdefault(tid, 0)

    if seq_count <= 0:
        raise ValueError("No sequence matches with given settings")

    RANK_CODES = {"species": "S", "genus": "G", "family": "F", "order": "O",
                  "class": "C", "phylum": "P", "kingdom": "K",
                  "superkingdom": "D"}

    out: List[str] = []

    def emit(pct: float, clade: float, taxo: float, code: str, tid: int,
             indent: int, name: str) -> None:
        out.append(f"{pct:6.2f}\t{int(clade)}\t{int(taxo)}\t{code}\t{tid}\t"
                   + "  " * indent + name)

    emit(clade_counts.get(0, 0) * 100.0 / seq_count, clade_counts.get(0, 0),
         taxo_counts.get(0, 0), "U", 0, 0, "unclassified")

    def dfs_report(node: int, depth: int) -> None:
        if not clade_counts.get(node) and not show_zeros:
            return
        emit(clade_counts.get(node, 0) * 100.0 / seq_count,
             clade_counts.get(node, 0), taxo_counts.get(node, 0),
             RANK_CODES.get(rank_map.get(node, ""), "-"), node, depth,
             name_map.get(node, ""))
        children = child_lists.get(node)
        if children:
            for child in sorted(children, key=lambda c: -clade_counts.get(c, 0)):
                dfs_report(child, depth + 1)

    dfs_report(1, 0)
    return out
