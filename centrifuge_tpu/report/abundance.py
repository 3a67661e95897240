"""Species abundance estimation: EM with SQUAREM acceleration.

Reimplements SpeciesMetrics::EM / calculateAbundance (aln_sink.h:196-495):
reads are grouped into equivalence classes by their (sorted) sets of
max-score taxon assignments; class counts are distributed over leaf taxa
proportionally to current abundance, genome-length-normalized, iterated to
convergence with SQUAREM extrapolation (Varadhan & Roland 2008).

Iteration orders follow the reference's std::map orderings so that the
floating-point results match bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from ..index.taxonomy import Taxonomy


def _em_step(observed_items, ancestors, tid_to_num, p, lens):
    """One E+M step (aln_sink.h:196-272)."""
    n = len(p)
    p_next = [0.0] * n
    for ids, count in observed_items:
        psum = 0.0
        for tid in ids:
            num = tid_to_num.get(tid)
            if num is not None:
                psum += p[num]
            else:
                children = ancestors.get(tid)
                if children is None:
                    continue
                for c_tid in children:
                    c_num = tid_to_num.get(c_tid)
                    if c_num is not None:
                        psum += p[c_num]
        if psum == 0.0:
            continue
        for tid in ids:
            num = tid_to_num.get(tid)
            if num is not None:
                p_next[num] += count * (p[num] / psum)
            else:
                children = ancestors.get(tid)
                if children is None:
                    continue
                for c_tid in children:
                    c_num = tid_to_num.get(c_tid)
                    if c_num is not None:
                        p_next[c_num] += count * (p[c_num] / psum)
    s = 0.0
    for i in range(n):
        s += p_next[i] / lens[i]
    for i in range(n):
        p_next[i] = p_next[i] / lens[i] / s
    return p_next


def calculate_abundance(tax: Taxonomy,
                        observed: Dict[Tuple[int, ...], int],
                        stats: dict = None
                        ) -> Tuple[Dict[int, float], Dict[int, float]]:
    """Returns (abundance, abundance_len) keyed by taxID.

    abundance_len is the genome-length-normalized probability (the value
    the report file prints); abundance re-weights by genome length.
    If `stats` is given, records num_iteration and last diff the way the
    reference logs them to stderr (aln_sink.h:471-472).
    """
    tree = tax.tree
    # observed classes in map order: (size, lexicographic ids)
    observed_items = sorted(observed.items(), key=lambda kv: (len(kv[0]), kv[0]))

    leaves = set()
    for ids, _ in observed_items:
        for tid in ids:
            node = tree.get(tid)
            if node is None or not node.leaf:
                continue
            leaves.add(tid)

    # non-leaf observed ids -> their descendant observed-leaf lists
    ancestors: Dict[int, List[int]] = {}
    sorted_leaves = sorted(leaves)
    for ids, _ in observed_items:
        for tid in ids:
            if tid in leaves or tid in ancestors:
                continue
            lst = []
            for leaf_tid in sorted_leaves:
                t = leaf_tid
                while True:
                    node = tree.get(t)
                    if node is None:
                        break
                    if tid == node.parent:
                        lst.append(leaf_tid)
                    if t == node.parent:
                        break
                    t = node.parent
            lst.sort()
            ancestors[tid] = lst

    # initialize p from class counts split evenly across members
    tid_to_num: Dict[int, int] = {}
    p: List[float] = []
    lens: List[int] = []
    for ids, count in observed_items:
        for tid in ids:
            if tid not in leaves:
                continue
            share = 1.0 / len(ids) * count
            num = tid_to_num.get(tid)
            if num is None:
                tid_to_num[tid] = len(p)
                p.append(share)
                lens.append(tax.sizes.get(tid, (1 << 64) - 1))
            else:
                p[num] += share
    if not p:
        return {}, {}
    s = 0.0
    for i in range(len(p)):
        s += p[i] / lens[i]
    for i in range(len(p)):
        p[i] = (p[i] / lens[i]) / s

    # SQUAREM-accelerated fixed point (aln_sink.h:425-469)
    num_iteration = 0
    diff = 0.0
    for _ in range(10001):
        p_next = _em_step(observed_items, ancestors, tid_to_num, p, lens)
        p_next2 = _em_step(observed_items, ancestors, tid_to_num, p_next, lens)
        ssr = 0.0
        ssv = 0.0
        p_r = [0.0] * len(p)
        p_v = [0.0] * len(p)
        for i in range(len(p)):
            p_r[i] = p_next[i] - p[i]
            ssr += p_r[i] * p_r[i]
            p_v[i] = p_next2[i] - p_next[i] - p_r[i]
            ssv += p_v[i] * p_v[i]
        if ssv > 0.0:
            gamma = -math.sqrt(ssr / ssv)
            for i in range(len(p)):
                p_next2[i] = max(0.0, p[i] - 2 * gamma * p_r[i] + gamma * gamma * p_v[i])
            p_next = _em_step(observed_items, ancestors, tid_to_num, p_next2, lens)
        diff = 0.0
        for i in range(len(p)):
            diff += abs(p[i] - p_next[i])
        if diff < 1e-10:
            break  # note: p (pre-update) is the reported vector
        num_iteration += 1
        if num_iteration >= 10000:
            break
        p = p_next
    if stats is not None:
        stats["num_iteration"] = num_iteration
        stats["diff"] = diff

    abundance_len = {}
    abundance = {}
    s = 0.0
    for tid in sorted(tid_to_num):
        num = tid_to_num[tid]
        abundance_len[tid] = p[num]
        s += p[num] * lens[num]
    for tid in sorted(tid_to_num):
        num = tid_to_num[tid]
        abundance[tid] = (p[num] * lens[num]) / s
    return abundance, abundance_len
