"""ctypes wrapper for the native assignment engine (assign.cpp).

Compiled on first use (g++ -O2 -shared). The Python implementation in
classify/algo.py remains the oracle; tests run both and compare.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_LIB_FAILED = False

MAX_POS = 64

i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_HERE, "assign.cpp")
    try:
        from .compile import build_native
        lib = C.CDLL(build_native(src))
        lib.ctx_create.restype = C.c_void_p
        lib.ctx_create.argtypes = [
            u64p, C.c_int64, u64p, u64p, C.c_int64,
            u64p, u64p, u16p, u8p, C.c_int64,
            u64p, C.c_int64, u64p, C.c_int64,
            C.c_int64, C.c_int64, C.c_int64, C.c_int64, C.c_int64]
        lib.ctx_free.argtypes = [C.c_void_p]
        lib.batch_begin.restype = C.c_void_p
        lib.batch_begin.argtypes = [
            C.c_void_p, i64p, i64p, i32p, i32p, i32p, i32p,
            C.c_int64, C.c_int64, i32p, i32p, i32p,
            C.c_int64, i32p, i32p, u8p, u32p]
        lib.batch_free.argtypes = [C.c_void_p]
        lib.batch_extension_misses.restype = C.c_int64
        lib.batch_extension_misses.argtypes = [
            C.c_void_p, i32p, i32p, i32p, i32p, C.c_int64]
        lib.batch_extension_feed.argtypes = [
            C.c_void_p, C.c_int64, i64p, i64p, i32p, i32p]
        lib.batch_resolve_requests.restype = C.c_int64
        lib.batch_resolve_requests.argtypes = [C.c_void_p, u64p, u64p,
                                               C.c_int64]
        lib.batch_set_resolutions.argtypes = [C.c_void_p, i32p, C.c_int64]
        lib.batch_finalize.restype = C.c_int64
        lib.batch_finalize.argtypes = [
            C.c_void_p, i32p, i64p, i64p, u64p, i32p, i64p, f64p,
            u8p, u8p, i32p, u32p, i64p, C.c_int64]
        lib.ctx_set_strings.argtypes = [
            C.c_void_p, u8p, i64p, C.c_int64, u8p, i64p, C.c_int64]
        lib.spm_seed_cur.argtypes = [C.c_void_p, u64p, C.c_int64]
        lib.spm_seed_counts.argtypes = [
            C.c_void_p, u64p, i64p, i64p, f64p, f64p, i64p, C.c_int64]
        lib.spm_sizes.argtypes = [C.c_void_p, i64p]
        lib.spm_export.argtypes = [
            C.c_void_p, u64p, i64p, i64p, f64p, f64p, i64p,
            i64p, u64p, u64p, u64p]
        lib.spm_reset.argtypes = [C.c_void_p]
        lib.batch_finalize_rows.restype = C.c_int64
        lib.batch_finalize_rows.argtypes = [
            C.c_void_p, u8p, i64p, i32p, u8p, C.c_int64, i64p, i32p, i64p]
        lib.gen_seeds.argtypes = [
            u8p, i64p, u8p, i64p, u8p, i64p,
            C.c_int64, C.c_uint64, u32p]
        _LIB = lib
    except Exception as e:
        from ..utils.fallback import warn_fallback
        warn_fallback("assign.cpp (assignment engine)", e)
        _LIB_FAILED = True
    return _LIB


class NativeAssigner:
    """Owns a taxonomy/config context; processes search-result batches."""

    def __init__(self, idx, cfg, classifier):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native assign engine unavailable")
        self.lib = lib
        self.idx = idx
        self.cfg = cfg
        tax = idx.taxonomy

        uid_tids = np.array([t for _, t in idx.uid_to_tid], dtype=np.uint64)
        path_items = sorted(tax.paths.items())
        path_tids = np.array([t for t, _ in path_items], dtype=np.uint64)
        paths10 = np.zeros((len(path_items), 10), dtype=np.uint64)
        for i, (_, p) in enumerate(path_items):
            paths10[i, : len(p)] = p
        tree_items = sorted(tax.tree.items())
        tree_tids = np.array([t for t, _ in tree_items], dtype=np.uint64)
        tree_parents = np.array([n.parent for _, n in tree_items],
                                dtype=np.uint64)
        tree_ranks = np.array([n.rank for _, n in tree_items],
                              dtype=np.uint16)
        tree_leaf = np.array([1 if n.leaf else 0 for _, n in tree_items],
                             dtype=np.uint8)
        host = np.array(sorted(classifier.host_set), dtype=np.uint64)
        excl = np.array(sorted(classifier.exclude_set), dtype=np.uint64)

        self._keepalive = (uid_tids, path_tids, paths10, tree_tids,
                           tree_parents, tree_ranks, tree_leaf, host, excl)
        self.ctx = lib.ctx_create(
            uid_tids, len(uid_tids),
            path_tids, paths10.reshape(-1), len(path_items),
            tree_tids, tree_parents, tree_ranks, tree_leaf, len(tree_items),
            host, len(host), excl, len(excl),
            cfg.khits, cfg.min_hitlen, classifier.ihits,
            classifier.class_rank_slot, 1 if cfg.tree_traverse else 0)

        # string tables for the native row formatter: uid display names
        # and the 30 rank strings (index/taxonomy.py)
        from ..index.taxonomy import RANK_MAX, rank_string
        uid_names = [u.encode() for u, _ in idx.uid_to_tid]
        uid_blob = b"".join(uid_names)
        uid_off = np.zeros(len(uid_names) + 1, dtype=np.int64)
        np.cumsum([len(n) for n in uid_names], out=uid_off[1:])
        rank_names = [rank_string(r).encode() for r in range(RANK_MAX)]
        rank_blob = b"".join(rank_names)
        rank_off = np.zeros(len(rank_names) + 1, dtype=np.int64)
        np.cumsum([len(n) for n in rank_names], out=rank_off[1:])
        self._max_uid_len = max((len(n) for n in uid_names), default=0)
        lib.ctx_set_strings(
            self.ctx, np.frombuffer(uid_blob, np.uint8), uid_off,
            len(uid_names), np.frombuffer(rank_blob, np.uint8), rank_off,
            len(rank_names))

    def __del__(self):
        if getattr(self, "ctx", None):
            self.lib.ctx_free(self.ctx)
            self.ctx = None

    def process(self, arrays, lane_map, lane_seqs, units, paired_flags,
                seeds, engine, resolver, metrics=None, prefetch=None,
                round_sync=None, mate_len=None):
        """Run the full host assignment for one batch.

        arrays: the 6 per-lane search outputs; lane_map: (unit, mate,
        strand) per lane; units: per unit list of (fw, rc) mate arrays;
        seeds: uint32 per unit. Returns (results_per_unit, secbest_per_unit)
        where each result is a tuple matching AlnResult fields.

        round_sync: cross-process max on host scalars (multi-host SPMD);
        when set, every process runs the same number of extension rounds
        and always issues the resolve call so the global device programs
        stay in lockstep.
        """
        bh = self._begin(arrays, lane_map, units, paired_flags, seeds,
                         mate_len=mate_len)
        n_units = len(units)
        try:
            self._ext_and_resolve(bh, units, engine, resolver, metrics,
                                  prefetch, round_sync)
            return self._finalize_results(bh, n_units)
        finally:
            self.lib.batch_free(bh)

    def _begin(self, arrays, lane_map, units, paired_flags, seeds,
               mate_len=None):
        """mate_len: optional (n_units, 2) int32 of per-mate read lengths;
        callers that already know them (the pipeline computes qlens for
        the row formatter anyway) pass it to skip a ~15 ms/32k-lane
        Python loop over the unit lists."""
        lib = self.lib
        h_top = np.ascontiguousarray(arrays[0], dtype=np.int64)
        h_bot = np.ascontiguousarray(arrays[1], dtype=np.int64)
        h_off, h_len, nhits, sums = [
            np.ascontiguousarray(a, dtype=np.int32) for a in arrays[2:]]
        L = h_top.shape[0]
        mh = h_top.shape[1]
        if isinstance(lane_map, np.ndarray):
            lm = np.ascontiguousarray(lane_map, dtype=np.int32)
            lane_unit = np.ascontiguousarray(lm[:, 0])
            lane_mate = np.ascontiguousarray(lm[:, 1])
            lane_strand = np.ascontiguousarray(lm[:, 2])
        else:
            lane_unit = np.array([u for u, _, _ in lane_map],
                                 dtype=np.int32)
            lane_mate = np.array([m for _, m, _ in lane_map],
                                 dtype=np.int32)
            lane_strand = np.array([s for _, _, s in lane_map],
                                   dtype=np.int32)
        n_units = len(units)
        n_mates = np.array([len(u) for u in units], dtype=np.int32)
        if mate_len is None:
            mate_len = np.zeros((n_units, 2), dtype=np.int32)
            for ui, unit in enumerate(units):
                for mi, (fw, _) in enumerate(unit):
                    mate_len[ui, mi] = len(fw)
        else:
            mate_len = np.ascontiguousarray(mate_len, dtype=np.int32)
        paired = np.array([1 if p else 0 for p in paired_flags],
                          dtype=np.uint8)
        seeds = np.ascontiguousarray(seeds, dtype=np.uint32)
        return lib.batch_begin(self.ctx, h_top.reshape(-1),
                               h_bot.reshape(-1),
                               h_off.reshape(-1), h_len.reshape(-1),
                               nhits, sums, L, mh,
                               lane_unit, lane_mate, lane_strand,
                               n_units, n_mates, mate_len.reshape(-1),
                               paired, seeds)

    def _ext_and_resolve(self, bh, units, engine, resolver, metrics,
                         prefetch, round_sync):
        lib = self.lib
        # extension fixpoint
        cap = 65536
        mu = np.zeros(cap, np.int32)
        mm = np.zeros(cap, np.int32)
        ms_ = np.zeros(cap, np.int32)
        mo = np.zeros(cap, np.int32)
        for _ in range(64):
            n = lib.batch_extension_misses(bh, mu, mm, ms_, mo, cap)
            gn = round_sync(n) if round_sync is not None else n
            if gn == 0:
                break
            seqs = [units[mu[i]][mm[i]][ms_[i]] for i in range(n)]
            if round_sync is None and hasattr(resolver, "first_hits"):
                # host extension search (fmwalk.fm_first_hits): a
                # handful of cross-strand extension misses must not pay
                # a full-shape device round trip (~100-300 ms at 12 Gbp)
                # nor serialize against the overlap pipeline's dev_lock.
                # Multi-host keeps the device path (SPMD lockstep).
                res = resolver.first_hits(seqs, mo[:n])
                if hasattr(engine, "stats"):
                    engine.stats["ext_lanes"] += n
                    engine.stats["ext_searches"] += 1
            else:
                res = engine.search_first_hits(seqs, mo[:n])
            if n:
                lib.batch_extension_feed(
                    bh, n,
                    np.ascontiguousarray(res[0][:, 0], np.int64),
                    np.ascontiguousarray(res[1][:, 0], np.int64),
                    np.ascontiguousarray(res[2][:, 0], np.int32),
                    np.ascontiguousarray(res[3][:, 0], np.int32))
        else:
            raise RuntimeError("extension fixpoint did not converge")

        # resolution
        rcap = 1 << 20
        tops = np.zeros(rcap, np.uint64)
        nelts = np.zeros(rcap, np.uint64)
        nreq = lib.batch_resolve_requests(bh, tops, nelts, rcap)
        if nreq > rcap:
            raise RuntimeError("resolve request buffer too small")
        values = np.zeros(0, np.int32)
        if nreq > 0:
            rdt = np.int64 if getattr(resolver, "wide", False) \
                else np.int32
            ne = nelts[:nreq].astype(np.int64)
            tp = tops[:nreq].astype(np.int64)
            tot = int(ne.sum())
            within = (np.arange(tot, dtype=np.int64)
                      - np.repeat(np.cumsum(ne) - ne, ne))
            rows = (np.repeat(tp, ne) + within).astype(rdt)
            if metrics is not None:
                metrics.resolve_rows += rows.shape[0]
            miss = np.ones(rows.shape[0], dtype=bool)
            values = np.zeros(rows.shape[0], np.int32)
            if prefetch is not None and prefetch[0].shape[0]:
                # serve rows from the speculative in-dispatch resolve
                prows, ptidx = prefetch
                pos = np.searchsorted(prows, rows)
                posc = np.minimum(pos, prows.shape[0] - 1)
                hit = prows[posc] == rows
                values[hit] = ptidx[posc[hit]]
                miss = ~hit
            if miss.any():
                mrows = rows[miss]
                if metrics is not None:
                    metrics.resolve_miss_rows += mrows.shape[0]
                if getattr(resolver, "needs_bucket", True):
                    # device resolver: pad to a jit shape bucket so the
                    # tunnel reuses one compiled program; serialized
                    # against other threads' jax calls (tail overlap)
                    from ..classify.engine import _bucket
                    import contextlib
                    padded = np.zeros(_bucket(mrows.shape[0]), rdt)
                    padded[: mrows.shape[0]] = mrows
                    with getattr(engine, "dev_lock", None) \
                            or contextlib.nullcontext():
                        values[miss] = np.asarray(
                            resolver(padded))[: mrows.shape[0]]
                else:
                    # host walk: no shape constraint; padded zero-rows
                    # would each cost a full wasted walk
                    values[miss] = np.asarray(resolver(mrows))
            values = np.ascontiguousarray(values, np.int32)
        elif round_sync is not None:
            # multi-host: issue the resolve even with zero local
            # requests so every process runs the same device program
            rdt = np.int64 if getattr(resolver, "wide", False) \
                else np.int32
            resolver(np.zeros(0, rdt))
        lib.batch_set_resolutions(bh, values, len(values))

    def _finalize_results(self, bh, n_units):
        lib = self.lib
        cap_res = n_units * max(self.cfg.khits, 5) + 8
        r_unit = np.zeros(cap_res, np.int32)
        r_score = np.zeros(cap_res, np.int64)
        r_maxs = np.zeros(cap_res, np.int64)
        r_tid = np.zeros(cap_res, np.uint64)
        r_rank = np.zeros(cap_res, np.int32)
        r_uidx = np.zeros(cap_res, np.int64)
        r_slen = np.zeros(cap_res, np.float64)
        r_isfw = np.zeros(cap_res, np.uint8)
        r_leaf = np.zeros(cap_res, np.uint8)
        r_npos = np.zeros(cap_res, np.int32)
        r_pos = np.zeros(cap_res * MAX_POS * 2, np.uint32)
        secbest = np.zeros(n_units, np.int64)
        nres = lib.batch_finalize(bh, r_unit, r_score, r_maxs, r_tid,
                                  r_rank, r_uidx, r_slen, r_isfw,
                                  r_leaf, r_npos, r_pos, secbest,
                                  cap_res)
        if nres < 0:
            raise RuntimeError("native result buffer too small")

        from ..classify.algo import AlnResult
        from ..index.taxonomy import rank_string
        per_unit: List[List[AlnResult]] = [[] for _ in range(n_units)]
        for i in range(nres):
            ui = int(r_unit[i])
            uidx = int(r_uidx[i])
            uid = (self.idx.uid_to_tid[uidx][0] if uidx >= 0
                   else rank_string(int(r_rank[i])))
            np_ = int(r_npos[i])
            pos = [(int(r_pos[(i * MAX_POS + p) * 2]),
                    int(r_pos[(i * MAX_POS + p) * 2 + 1]))
                   for p in range(np_)]
            per_unit[ui].append(AlnResult(
                score=int(r_score[i]), max_score=int(r_maxs[i]), uid=uid,
                tax_id=int(r_tid[i]), tax_rank=int(r_rank[i]),
                summed_len=float(r_slen[i]), read_positions=pos,
                is_fw=bool(r_isfw[i]), is_leaf=bool(r_leaf[i])))
        return per_unit, [int(s) for s in secbest]

    def process_rows(self, arrays, lane_map, lane_seqs, units, paired_flags,
                     seeds, engine, resolver, names, qlens,
                     metrics=None, prefetch=None, round_sync=None,
                     mate_len=None):
        """As process(), but classification, selection, AND default-column
        row formatting all happen natively: returns (rows, unit_nres,
        secbest) where rows is the finished List[str] for the batch.

        Species metrics accumulate in the native ctx (exact same
        per-read update order as the Python formatter); drain them into
        a SpeciesMetrics via spm_drain() before reading/merging it.

        names: per-unit raw read name bytes; qlens: per-unit reported
        queryLength (paired rows count filtered mates too).
        """
        lib = self.lib
        n_units = len(units)
        bh = self._begin(arrays, lane_map, units, paired_flags, seeds,
                         mate_len=mate_len)
        try:
            self._ext_and_resolve(bh, units, engine, resolver, metrics,
                                  prefetch, round_sync)
            name_blob = b"".join(names)
            name_off = np.zeros(n_units + 1, dtype=np.int64)
            if names:
                np.cumsum([len(n) for n in names], out=name_off[1:])
            qlen_arr = np.ascontiguousarray(qlens, dtype=np.int32)
            secbest = np.zeros(n_units, np.int64)
            unit_nres = np.zeros(n_units, np.int32)
            max_rows = n_units * max(self.cfg.khits, 1)
            cap = (len(name_blob) * max(self.cfg.khits, 1)
                   + max_rows * (self._max_uid_len + 160) + 1024)
            nb = np.frombuffer(name_blob, np.uint8) if name_blob \
                else np.zeros(1, np.uint8)
            for _ in range(4):
                out = np.empty(cap, np.uint8)
                out_bytes = np.zeros(1, np.int64)
                nrows = lib.batch_finalize_rows(
                    bh, nb, name_off, qlen_arr, out, cap,
                    secbest, unit_nres, out_bytes)
                if nrows >= 0:
                    break
                cap *= 4
            else:
                raise RuntimeError("native row buffer too small")
        finally:
            lib.batch_free(bh)
        blob = out[: int(out_bytes[0])].tobytes().decode()
        rows = blob.split("\n")[:-1] if blob else []
        return rows, unit_nres, secbest

    # ---- native species-metrics state (flat row path) ----

    def spm_seed(self, spm) -> None:
        """Move `spm`'s pending state (cur_ids carry-over AND per-taxon
        count partials) into the native accumulator, so native adds
        continue the exact same float accumulation sequence the Python
        path would have produced. `spm.observed` stays Python-side
        (integer counts; merge order is exact regardless)."""
        if spm.cur_ids:
            ids = np.ascontiguousarray(spm.cur_ids, dtype=np.uint64)
            self.lib.spm_seed_cur(self.ctx, ids, len(ids))
            spm.cur_ids.clear()
        if spm.species_counts:
            items = list(spm.species_counts.items())
            n = len(items)
            tids = np.array([t for t, _ in items], dtype=np.uint64)
            n_reads = np.array([v[0] for _, v in items], dtype=np.int64)
            sum_score = np.array([v[1] for _, v in items], dtype=np.int64)
            shl = np.array([v[2] for _, v in items], dtype=np.float64)
            weighted = np.array([v[3] for _, v in items], dtype=np.float64)
            n_unique = np.array([v[4] for _, v in items], dtype=np.int64)
            self.lib.spm_seed_counts(self.ctx, tids, n_reads, sum_score,
                                     shl, weighted, n_unique, n)
            spm.species_counts.clear()

    def spm_drain(self, spm) -> None:
        """Merge the natively accumulated species metrics into `spm` and
        reset the native state. Update order within the native run is
        identical to the Python formatter's, so totals are bit-exact when
        the flat path's reads precede any Python-path adds for a taxon."""
        sizes = np.zeros(4, np.int64)
        self.lib.spm_sizes(self.ctx, sizes)
        nc, no, nids, ncur = (int(x) for x in sizes)
        if nc == 0 and no == 0 and ncur == 0:
            return
        tids = np.zeros(max(nc, 1), np.uint64)
        n_reads = np.zeros(max(nc, 1), np.int64)
        sum_score = np.zeros(max(nc, 1), np.int64)
        shl = np.zeros(max(nc, 1), np.float64)
        weighted = np.zeros(max(nc, 1), np.float64)
        n_unique = np.zeros(max(nc, 1), np.int64)
        obs_klen = np.zeros(max(no, 1), np.int64)
        obs_count = np.zeros(max(no, 1), np.uint64)
        obs_ids = np.zeros(max(nids, 1), np.uint64)
        cur = np.zeros(max(ncur, 1), np.uint64)
        self.lib.spm_export(self.ctx, tids, n_reads, sum_score, shl,
                            weighted, n_unique, obs_klen, obs_count,
                            obs_ids, cur)
        counts = spm.species_counts
        for i in range(nc):
            sc = counts.setdefault(int(tids[i]), [0, 0, 0.0, 0.0, 0])
            sc[0] += int(n_reads[i])
            sc[1] += int(sum_score[i])
            sc[2] += float(shl[i])
            sc[3] += float(weighted[i])
            sc[4] += int(n_unique[i])
        observed = spm.observed
        p = 0
        for e in range(no):
            k = int(obs_klen[e])
            key = tuple(int(x) for x in obs_ids[p: p + k])
            p += k
            observed[key] = observed.get(key, 0) + int(obs_count[e])
        spm.cur_ids.extend(int(x) for x in cur[:ncur])

    def spm_reset(self) -> None:
        self.lib.spm_reset(self.ctx)
