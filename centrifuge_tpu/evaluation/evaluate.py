"""Accuracy scoring against simulated ground truth.

Mirrors evaluation/centrifuge_evaluate.py's compare_scm (lines 26-115):
per-read classification is scored at strain/species/genus level -- a read
is correct at a level if any of its reported taxIDs maps (walking up the
taxonomy) to the same taxon as the truth taxID at that level; and
compare_abundance (lines 117-163): sum of squared residuals between
estimated and true abundance.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..index.taxonomy import RANK_GENUS, RANK_SPECIES, Taxonomy


def taxid_at_rank(tax: Taxonomy, tid: int, rank: int) -> int:
    """Walk up from tid to the ancestor at `rank` (0 if none);
    taxonomy.h:307-324 semantics."""
    seen = set()
    while tid not in seen:
        seen.add(tid)
        node = tax.tree.get(tid)
        if node is None:
            return 0
        if node.rank == rank:
            return tid
        if node.rank != 0 and node.rank > rank:
            return 0
        if node.parent == tid:
            return 0
        tid = node.parent
    return 0


@dataclass
class LevelScore:
    correct: int = 0
    total: int = 0

    @property
    def accuracy(self) -> float:
        return self.correct / self.total if self.total else 0.0


@dataclass
class EvalResult:
    strain: LevelScore = field(default_factory=LevelScore)
    species: LevelScore = field(default_factory=LevelScore)
    genus: LevelScore = field(default_factory=LevelScore)
    unclassified: int = 0
    reads: int = 0


def parse_truth(path: str) -> Dict[str, int]:
    truth: Dict[str, int] = {}
    with open(path) as f:
        header = f.readline()
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3:
                truth[parts[0]] = int(parts[2].split(".")[0])
    return truth


def evaluate_classification(tax: Taxonomy, classification_rows: List[str],
                            truth_by_read: Dict[str, int]) -> EvalResult:
    """Score a classification TSV against read-name-encoded truth.

    Reads are named '<uid>|<tid>|<pos>_<n>'; the readID column therefore
    carries its own truth (like the reference's simulated sets).
    """
    res = EvalResult()
    per_read: Dict[str, List[int]] = {}
    header = None
    col = {}
    for line in classification_rows:
        line = line.rstrip("\n")
        if header is None:
            header = line.split("\t")
            col = {c: i for i, c in enumerate(header)}
            continue
        parts = line.split("\t")
        rid = parts[col["readID"]]
        tid_s = parts[col["taxID"]]
        tid = int(tid_s.split(".")[0])
        per_read.setdefault(rid, []).append(tid)

    for rid, tids in per_read.items():
        # recover truth from the read name ('uid|tid|pos_n')
        true_tid = None
        if rid in truth_by_read:
            true_tid = truth_by_read[rid]
        else:
            fields = rid.split("|")
            if len(fields) >= 2:
                try:
                    true_tid = int(fields[1])
                except ValueError:
                    pass
        if true_tid is None:
            continue
        res.reads += 1
        if tids == [0]:
            res.unclassified += 1
        # strain level: exact taxID match
        res.strain.total += 1
        if true_tid in tids:
            res.strain.correct += 1
        for rank, score in ((RANK_SPECIES, res.species),
                            (RANK_GENUS, res.genus)):
            want = taxid_at_rank(tax, true_tid, rank)
            if want == 0:
                continue
            score.total += 1
            if any(taxid_at_rank(tax, t, rank) == want for t in tids if t):
                score.correct += 1
    return res


def compare_abundance(estimated: Dict[int, float],
                      true_fracs: Dict[int, float]) -> float:
    """Sum of squared residuals over the union of taxa
    (centrifuge_evaluate.py:117-163)."""
    ssr = 0.0
    for tid in set(estimated) | set(true_fracs):
        ssr += (estimated.get(tid, 0.0) - true_fracs.get(tid, 0.0)) ** 2
    return ssr
