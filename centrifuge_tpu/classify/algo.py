"""The Centrifuge classification algorithm, backend-agnostic host logic.

This module implements the exact per-read decision logic of the reference
engine (classifier.h + hi_aligner.h): greedy FM backward-search partial
hits, cross-strand extension/dedup/trim, strand selection, SA-range
resolution to genomes, candidate scoring, taxonomy-tree reduction to <= k
labels, and result-row selection. The FM primitives are supplied by a
backend object (the numpy FMOracle, or batched results from the TPU
engine); everything here is plain Python/numpy host code operating on a
handful of small per-read structures.

File:line citations refer to /root/reference (C++ Centrifuge) for parity
auditing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..index.cf_io import CFIndex
from ..index.taxonomy import (RANK_UNKNOWN, rank_id, rank_string,
                              rank_to_path_slot, N_PATH_RANKS)
from ..utils.rng import LCG, shuffle_portion

OFF_MASK = (1 << 64) - 1


@dataclass
class PartialHit:
    """One exact-match partial hit: SA range + read span.

    bwoff counts characters from the *right* end of the searched strand
    (hi_aligner.h:58-142); length may be 0 after trimming.
    """
    top: int
    bot: int
    bwoff: int
    length: int

    @property
    def size(self) -> int:
        if self.top == OFF_MASK or self.bot <= self.top:
            return 0
        return self.bot - self.top

    def reset(self) -> None:
        self.top = self.bot = 0
        self.bwoff = OFF_MASK
        self.length = 0


class StrandState:
    """Per-(read,strand) search cursor + emitted hits (ReadBWTHit analog)."""

    def __init__(self, length: int):
        self.length = length
        self.cur = 0
        self.done = False
        self.hits: List[PartialHit] = []

    def clone(self) -> "StrandState":
        """Fast deep copy (hits are mutated by extend_and_filter)."""
        st = StrandState(self.length)
        st.cur = self.cur
        st.done = self.done
        st.hits = [PartialHit(h.top, h.bot, h.bwoff, h.length)
                   for h in self.hits]
        return st


def partial_search(fm, seq: np.ndarray, st: StrandState) -> None:
    """One greedy exact extension from st.cur (hi_aligner.h:902-1031).

    Consumes the strand right-to-left: the character at distance `dep`
    from the right end is seq[len-dep-1]. Emits exactly one hit (possibly
    an empty pseudo-hit) and advances the cursor.
    """
    ftlen = fm.idx.ftab_chars
    n = st.length
    offset = st.cur
    dep = offset
    left = n - dep
    if left < ftlen:
        st.cur = n
        st.hits.append(PartialHit(OFF_MASK, OFF_MASK, offset, st.cur - offset))
        st.done = True
        return
    # N within the ftab window cuts the search short (hi_aligner.h:946-961)
    for i in range(ftlen):
        if seq[n - dep - 1 - i] > 3:
            st.cur += i + 1
            st.hits.append(PartialHit(OFF_MASK, OFF_MASK, offset, st.cur - offset))
            if st.cur >= n:
                st.done = True
            return
    top, bot = fm.ftab_lookup(seq[n - dep - ftlen: n - dep])
    dep += ftlen
    if bot <= top:
        st.cur = dep
        st.hits.append(PartialHit(OFF_MASK, OFF_MASK, offset, st.cur - offset))
        if st.cur >= n:
            st.done = True
        return
    while dep < n:
        c = int(seq[n - dep - 1])
        if c > 3:
            break
        if bot - top > 1:
            t2 = int(fm.lf(top, c))
            b2 = int(fm.lf(bot, c))
        else:
            # single-row range: proceed only if this row's BWT char is c
            # and the row is not the '$' row (bt2_idx.h:2910-2934)
            if top == fm.zoff or int(fm.bwt[top]) != c:
                break
            t2 = int(fm.lf(top, c))
            b2 = t2 + 1
        if b2 <= t2:
            break
        top, bot = t2, b2
        dep += 1
    st.hits.append(PartialHit(top, bot, offset, dep - offset))
    st.cur = dep
    if st.cur >= n:
        st.done = True


def search_strand(fm, seq: np.ndarray, min_hitlen: int, increment: int) -> Tuple[StrandState, int]:
    """Full per-strand scan loop (classifier.h:666-772 driver policy).

    Returns the strand state and the sum of hit lengths >= min_hitlen.
    """
    st = StrandState(len(seq))
    total = 0
    while not st.done:
        partial_search(fm, seq, st)
        last = st.hits[-1]
        if st.done:
            if last.length >= min_hitlen:
                total += last.length
            break
        if last.length >= min_hitlen:
            total += last.length
        if last.length > increment:
            st.cur += 1  # skip the mismatching position (classifier.h:727-736)
        if st.cur + min_hitlen >= st.length:
            st.done = True
            break
    return st, total


def search_from_offset(fm, seq: np.ndarray, offset: int) -> PartialHit:
    """One partialSearch starting at a given offset; first hit only.

    Used by the cross-strand extension pass (classifier.h:810-845).
    """
    st = StrandState(len(seq))
    st.cur = offset
    partial_search(fm, seq, st)
    return st.hits[0]


def extend_and_filter(do_search, rdlen: int,
                      states: List[StrandState], sums: List[int],
                      min_hitlen: int, ihits: int) -> None:
    """Cross-strand extension, over-mapped dedup, and intra-strand trim.

    Mirrors classifier.h:789-895 exactly, including in-place hit mutation
    mid-loop. `do_search(strand_idx, offset)` must return the first
    partial hit of a fresh search from `offset` on that strand (the
    oracle runs it inline; the TPU path serves it from a batched cache).
    """
    hits_fw, hits_rc = states[0].hits, states[1].hits
    if sums[0] >= min_hitlen and sums[1] >= min_hitlen:
        # extension: if a hit on one strand is covered further by an
        # overlapping (not nested, not identical) hit on the other strand,
        # re-search from the union start and adopt the result if it spans
        # the union exactly
        for hit in hits_fw:
            length = hit.length
            l = hit.bwoff
            r = hit.bwoff + length
            for rchit in hits_rc:
                rclen = rchit.length
                if length < min_hitlen and rclen < min_hitlen:
                    continue
                rc_l = rdlen - rchit.bwoff - rchit.length
                rc_r = rc_l + rclen
                if r <= rc_l or rc_r <= l:
                    continue
                if l == rc_l and r == rc_r:
                    continue
                if (l < rc_l and r > rc_r) or (l > rc_l and r < rc_r):
                    continue
                if l > rc_l:
                    tmp = do_search(0, rc_l)
                    if tmp.length == length + l - rc_l:
                        hit.top, hit.bot = tmp.top, tmp.bot
                        hit.bwoff, hit.length = tmp.bwoff, tmp.length
                if r > rc_r:
                    tmp = do_search(1, rdlen - r)
                    if tmp.length == rclen + r - rc_r:
                        rchit.top, rchit.bot = tmp.top, tmp.bot
                        rchit.bwoff, rchit.length = tmp.bwoff, tmp.length
                # NOTE: l/r/length intentionally NOT refreshed here; the
                # reference keeps the stale values for the remainder of
                # the inner loop (classifier.h:793-846)
        # drop pairs of identical-span hits mapping too many places
        for hit in hits_fw:
            length = hit.length
            l = hit.bwoff
            r = hit.bwoff + length
            for rchit in hits_rc:
                rclen = rchit.length
                rc_l = rdlen - rchit.bwoff - rchit.length
                rc_r = rc_l + rclen
                if rc_l < l:
                    break
                if length != rclen:
                    continue
                if l == rc_l and r == rc_r and hit.size + rchit.size > ihits:
                    hit.reset()
                    rchit.reset()
                    break
    # intra-strand overlap trim (classifier.h:873-895)
    for st in states:
        hits = st.hits
        if len(hits) < 2:
            continue
        for i in range(len(hits) - 1):
            hit = hits[i]
            for j in range(i + 1, len(hits)):
                hit2 = hits[j]
                if hit.bwoff >= hit2.bwoff:
                    hit.length = 0
                    break
                if hit.bwoff + hit.length <= hit2.bwoff:
                    break
                if hit.length >= hit2.length:
                    hit2_end = hit2.bwoff + hit2.length
                    hit2.bwoff = hit.bwoff + hit.length
                    # u64 wrap kept deliberately: the reference stores _len
                    # unsigned, so a nested hit yields a huge length here
                    hit2.length = (hit2_end - hit2.bwoff) & OFF_MASK
                else:
                    hit.length = hit2.bwoff - hit.bwoff


def choose_strand(states: List[StrandState], min_hitlen: int) -> Tuple[int, int]:
    """Pick strand(s) by total (len-15)^2, tie-break by max hit length.

    Returns a (start, end) range over strand indexes (classifier.h:898-941).
    """
    score = [0, 0]
    maxlen = [0, 0]
    for fwi in (0, 1):
        for h in states[fwi].hits:
            if h.length < min_hitlen:
                continue
            score[fwi] += (h.length - 15) * (h.length - 15)
            if h.length > maxlen[fwi]:
                maxlen[fwi] = h.length
    if score[0] != score[1]:
        fwi = 0 if score[0] > score[1] else 1
    elif maxlen[0] != maxlen[1]:
        fwi = 0 if maxlen[0] > maxlen[1] else 1
    else:
        return (0, 2)
    return (fwi, fwi + 1)


def sort_hits(hits: List[PartialHit]) -> List[PartialHit]:
    """Order candidates: small SA ranges first, long hits first.

    compareBWTHits (classifier.h:1058-1086). Stable sort; the reference
    uses std::sort, which for the typical (<16) hit counts degenerates to
    insertion sort and is also stable.
    """
    import functools

    def cmp(a: PartialHit, b: PartialHit) -> int:
        if a.length >= 22 or b.length >= 22:
            if a.length >= 22 and b.length >= 22:
                if a.size < b.size:
                    return -1
                if a.size > b.size:
                    return 1
            if b.length < a.length:
                return -1
            if b.length > a.length:
                return 1
        if b.length * a.size < a.length * b.size:
            return -1
        if b.length * a.size > a.length * b.size:
            return 1
        if a.size < b.size:
            return -1
        if a.size > b.size:
            return 1
        if b.length < a.length:
            return -1
        if b.length > a.length:
            return 1
        return 0

    return sorted(hits, key=functools.cmp_to_key(cmp))


@dataclass
class HitCount:
    """Per-candidate accumulator (classifier.h:31-121)."""
    unique_id: int
    tax_id: int
    count: int = 0
    score: int = 0
    scores: List[List[int]] = field(default_factory=lambda: [[0, 0], [0, 0]])
    summed_len: float = 0.0
    summed_lens: List[List[float]] = field(default_factory=lambda: [[0.0, 0.0], [0.0, 0.0]])
    timestamp: int = 0
    read_positions: List[Tuple[int, int]] = field(default_factory=list)
    leaf: bool = True
    num_leaves: int = 1
    rank: int = 0
    path: Tuple[int, ...] = ()

    def finalize(self, paired: bool) -> None:
        if paired:
            self.score = (max(self.scores[0][0], self.scores[0][1])
                          + max(self.scores[1][0], self.scores[1][1]))
            self.summed_len = (max(self.summed_lens[0][0], self.summed_lens[0][1])
                               + max(self.summed_lens[1][0], self.summed_lens[1][1]))
        else:
            self.score = max(self.scores[0][0], self.scores[0][1])
            self.summed_len = max(self.summed_lens[0][0], self.summed_lens[0][1])


@dataclass
class AlnResult:
    """One reportable assignment (aligner_result.h:205-351 analog)."""
    score: int
    max_score: int
    uid: str            # seq ID string, or rank string for inner nodes
    tax_id: int
    tax_rank: int
    summed_len: float
    read_positions: List[Tuple[int, int]]
    is_fw: bool
    is_leaf: bool = True


@dataclass
class ClassifierConfig:
    khits: int = 5
    min_hitlen: int = 22
    tree_traverse: bool = True
    classification_rank: str = "strain"
    host_taxids: Tuple[int, ...] = ()
    exclude_taxids: Tuple[int, ...] = ()

    def ihits(self, compressed: bool) -> int:
        # internal in-flight cap (aln_sink.h:573-609)
        base = max(self.khits, 5) * 40
        return base * 4 if compressed else base


class Classifier:
    """Per-read classification over a loaded index + FM backend."""

    def __init__(self, idx: CFIndex, fm, cfg: ClassifierConfig):
        self.idx = idx
        self.fm = fm
        self.cfg = cfg
        self.ihits = cfg.ihits(idx.compressed)
        # increment rule (classifier.h:226)
        self.increment = 10 if 2 * cfg.min_hitlen <= 33 else 2 * cfg.min_hitlen - 33
        cr = rank_id(cfg.classification_rank)
        self.class_rank_slot = rank_to_path_slot(cr)
        tax = idx.taxonomy
        self.host_set = tax.descendant_closure(list(cfg.host_taxids)) if cfg.host_taxids else set()
        self.exclude_set = tax.descendant_closure(list(cfg.exclude_taxids)) if cfg.exclude_taxids else set()

    # -- search one mate: returns strand states after all passes --
    def search_mate(self, seq_fw: np.ndarray, seq_rc: np.ndarray):
        states = []
        sums = []
        for seq in (seq_fw, seq_rc):
            st, total = search_strand(self.fm, seq, self.cfg.min_hitlen, self.increment)
            states.append(st)
            sums.append(total)
        seqs = (seq_fw, seq_rc)
        do_search = lambda si, off: search_from_offset(self.fm, seqs[si], off)
        extend_and_filter(do_search, len(seq_fw), states, sums,
                          self.cfg.min_hitlen, self.ihits)
        return states

    def resolve_range(self, top: int, bot: int, nelt: int) -> List[int]:
        """First nelt elements of [top,bot) -> sequence indexes, in order."""
        return [self.fm.resolve_row(top + k) for k in range(nelt)]

    # -- full classification of a read or pair --
    def classify(self, mates: List[Tuple[np.ndarray, np.ndarray]],
                 paired: bool) -> List[AlnResult]:
        """mates: list of (seq_fw, seq_rc); 1 or 2 entries.

        Returns reportable results (empty => unclassified). Follows
        Classifier::go (classifier.h:212-571).
        """
        mate_states = [self.search_mate(fw, rc) for fw, rc in mates]
        return self.classify_with_states(
            mates, mate_states, paired, self.resolve_range)

    def classify_with_states(self, mates, mate_states, paired: bool,
                             resolve_fn) -> List[AlnResult]:
        """Classification given precomputed per-mate strand states.

        `resolve_fn(top, bot, nelt)` supplies SA resolutions; the sequence
        of its invocations is independent of the values it returns, which
        lets the TPU path run this twice: once recording requests, once
        consuming batch-resolved values.
        """
        cfg = self.cfg
        hit_map: List[HitCount] = []
        max_genome_hit_size = cfg.khits
        ts = 0
        is_fw = False
        for rdi, (seq_fw, seq_rc) in enumerate(mates):
            states = mate_states[rdi]
            fw_start, fw_end = choose_strand(states, cfg.min_hitlen)
            for fwi in range(fw_start, fw_end):
                st = states[fwi]
                is_fw = (fwi == 0)
                for h in st.hits:
                    if h.length >= cfg.min_hitlen and h.size > max_genome_hit_size:
                        max_genome_hit_size = h.size
                if max_genome_hit_size > cfg.khits:
                    max_genome_hit_size += cfg.khits
                shits = sort_hits(st.hits)
                genome_hit_cnt = 0
                for hi, h in enumerate(shits):
                    # NOTE: ts advances at the *end* of each completed
                    # iteration (C++ `for(..; hi++, ts++)`), so a `break`
                    # leaves it unincremented -- subsequent mates can then
                    # collide with the previous mate's timestamps and have
                    # their first hit dropped by the dedup below. This is
                    # reference behaviour (classifier.h:270,1020) and is
                    # reproduced deliberately.
                    cur_ts = ts
                    if h.length <= cfg.min_hitlen or h.size == 0:
                        ts += 1
                        continue
                    nelt = min(h.size, max_genome_hit_size)
                    seq_ids = resolve_fn(h.top, h.bot, nelt)
                    if not seq_ids:
                        ts += 1
                        continue
                    if nelt > self.ihits:
                        ts += 1
                        continue
                    genome_hit_cnt += nelt
                    # dedupe by sequence id, preserving first-seen order
                    coord_ids: List[Tuple[int, int]] = []
                    seen = set()
                    for sid in seq_ids:
                        if sid in seen:
                            continue
                        seen.add(sid)
                        coord_ids.append((sid, self.idx.uid_to_tid[sid][1]))
                    score = (h.length - 15) * (h.length - 15)
                    weight = float(h.length)
                    for sid, tid in coord_ids:
                        if tid in self.exclude_set:
                            continue
                        self._add_hit(hit_map, rdi, fwi, sid, tid, cur_ts,
                                      score, weight, h.bwoff, h.length)
                    if genome_hit_cnt >= max_genome_hit_size:
                        break
                    ts += 1
        for hc in hit_map:
            hc.finalize(paired)

        # host-taxid preference (classifier.h:384-394)
        best_score = 0
        only_host = False
        for hc in hit_map:
            if hc.score > best_score:
                best_score = hc.score
                only_host = hc.tax_id in self.host_set
            elif hc.score == best_score:
                only_host = only_host or (hc.tax_id in self.host_set)

        if not only_host and len(hit_map) > cfg.khits:
            hit_map = self._reduce(hit_map)
            if hit_map is None:
                return []
        if not only_host and len(hit_map) > cfg.khits:
            return []

        rdlen = len(mates[0][0])
        max_score = (rdlen - 15) * (rdlen - 15) if rdlen > 15 else 0
        if paired:
            rdlen2 = len(mates[1][0])
            max_score += (rdlen2 - 15) * (rdlen2 - 15) if rdlen2 > 15 else 0

        results: List[AlnResult] = []
        tree = self.idx.taxonomy.tree
        for hc in hit_map:
            if only_host and hc.tax_id not in self.host_set:
                continue
            node = tree.get(hc.tax_id)
            tax_rank = node.rank if node is not None else RANK_UNKNOWN
            if hc.unique_id < len(self.idx.uid_to_tid):
                uid = self.idx.uid_to_tid[hc.unique_id][0]
            else:
                uid = rank_string(tax_rank)
            results.append(AlnResult(
                score=hc.score, max_score=max_score, uid=uid,
                tax_id=hc.tax_id, tax_rank=tax_rank,
                summed_len=hc.summed_len,
                read_positions=list(hc.read_positions), is_fw=is_fw,
                is_leaf=(node.leaf if node is not None else True)))
        return results

    def _add_hit(self, hit_map: List[HitCount], rdi: int, fwi: int,
                 unique_id: int, tax_id: int, ts: int, score: int,
                 weight: float, offset: int, length: int) -> None:
        """addHitToHitMap (classifier.h:982-1050)."""
        path = self.idx.taxonomy.get_path(tax_id)
        rank = self.class_rank_slot
        if rank > 0:
            r = rank
            while r < len(path):
                if path[r] != 0:
                    tax_id = path[r]
                    rank = r
                    break
                r += 1
            else:
                rank = r if path else rank
        for hc in hit_map:
            same = (unique_id == hc.unique_id) if rank == 0 else (tax_id == hc.tax_id)
            if same:
                if hc.timestamp != ts:
                    hc.count += 1
                    hc.scores[rdi][fwi] += score
                    hc.summed_lens[rdi][fwi] += weight
                    hc.timestamp = ts
                    hc.read_positions.append((offset, length))
                return
        hc = HitCount(unique_id=unique_id, tax_id=tax_id)
        hc.count = 1
        hc.scores[rdi][fwi] = score
        hc.summed_lens[rdi][fwi] = weight
        hc.timestamp = ts
        hc.read_positions.append((offset, length))
        hc.path = path
        hc.rank = rank
        hit_map.append(hc)

    def _reduce(self, hit_map: List[HitCount]) -> Optional[List[HitCount]]:
        """Best-score filter + taxonomy-tree merge down to <= k labels.

        classifier.h:399-515, replicated including the swap-with-last
        removal order (it changes the final report order) and the
        count-sorted parent merge sequence.
        """
        cfg = self.cfg
        best = max(hc.score for hc in hit_map)
        i = 0
        while i < len(hit_map):
            if hit_map[i].score < best:
                if i + 1 < len(hit_map):
                    hit_map[i] = hit_map[-1]
                hit_map.pop()
            else:
                i += 1
        if not cfg.tree_traverse:
            if len(hit_map) > cfg.khits:
                return None
            return hit_map

        RANK_MAX_U8 = 255
        rank = 0
        while len(hit_map) > cfg.khits:
            tax_count: List[Tuple[int, int]] = []  # (count, parent_taxID)
            for hc in hit_map:
                while hc.rank < rank:
                    if hc.rank + 1 >= len(hc.path):
                        hc.rank = RANK_MAX_U8
                        break
                    hc.rank += 1
                    hc.tax_id = hc.path[hc.rank]
                    hc.leaf = False
                if hc.rank > rank:
                    continue
                parent = hc.path[rank + 1] if rank + 1 < len(hc.path) else 1
                if parent == 0:
                    continue
                for j, (cnt, ptid) in enumerate(tax_count):
                    if ptid == parent:
                        tax_count[j] = (cnt + 1, ptid)
                        break
                else:
                    tax_count.append((1, parent))
            if not tax_count:
                if rank < len(hit_map[0].path):
                    rank += 1
                    continue
                else:
                    break
            tax_count.sort()
            for cnt, parent in reversed(tax_count):
                for hc in hit_map:
                    if hc.rank != rank:
                        continue
                    cur_parent = hc.path[rank + 1] if rank + 1 < len(hc.path) else 1
                    if parent == cur_parent:
                        hc.unique_id = OFF_MASK
                        hc.rank = rank + 1
                        hc.tax_id = parent
                        hc.leaf = False
                # merge same-taxID entries, keeping the first as the rep
                first = True
                rep: Optional[HitCount] = None
                i = 0
                while i < len(hit_map):
                    hc = hit_map[i]
                    if parent == hc.tax_id:
                        if not first:
                            rep.num_leaves += hc.num_leaves
                            if i + 1 < len(hit_map):
                                hit_map[i] = hit_map[-1]
                            hit_map.pop()
                            continue
                        first = False
                        rep = hc
                    i += 1
                if len(hit_map) <= cfg.khits:
                    break
            rank += 1
            if rank > len(hit_map[0].path):
                break
        return hit_map


def select_results(results: List[AlnResult], khits: int, rnd: LCG,
                   secondary: bool = False) -> Tuple[List[AlnResult], int]:
    """Order and truncate results for reporting; returns (rows, secbest).

    Implements selectByScore (aln_sink.h:1860-1927): descending score with
    descending-original-index tie order, equal-score streaks shuffled by
    the per-read LCG, then (without --secondary) truncated at the first
    score drop. secbest is the second-best score across all results
    including ties of the best (aligner_result.h:398-427); 0 when absent.
    """
    sz = len(results)
    if sz == 0:
        return [], 0
    num = min(sz, khits)
    buf = sorted(((r.score, i) for i, r in enumerate(results)))
    buf.reverse()
    streak = 0
    for i in range(1, len(buf)):
        if buf[i][0] == buf[i - 1][0]:
            if streak == 0:
                streak = 1
            streak += 1
        else:
            if streak > 1:
                shuffle_portion(buf, i - streak, streak, rnd)
            streak = 0
    if streak > 1:
        shuffle_portion(buf, len(buf) - streak, streak, rnd)
    select = [buf[i][1] for i in range(num)]
    if not secondary:
        for i in range(len(select) - 1):
            if buf[i][0] != buf[i + 1][0]:
                select = select[: i + 1]
                break
    # second-best score over the whole result set
    best = secbest = None
    for r in results:
        sc = r.score
        if best is None or sc > best:
            secbest = best
            best = sc
        elif secbest is None or sc > secbest:
            secbest = sc
    return [results[i] for i in select], (secbest if secbest is not None else 0)
