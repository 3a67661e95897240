"""Byte-exact .cf index emission (vectorized numpy).

Re-expresses the reference's Ebwt build path -- header + join metadata
(bt2_io.h:854-931, joinToDisk bt2_idx.h:3235-3330, szsToDisk
bt2_io.h:989-1028) and buildToDisk (bt2_idx.h:3379-3860) -- as a set of
array computations over the suffix array instead of a streaming
char-at-a-time loop. Every structure (sides+checkpoints, ftab/eftab,
SA-sample tidx, boundary map, .3.cf taxonomy payload) matches the
reference writer bit for bit; tests rebuild the fixture indexes and
compare files byte-by-byte.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..index.taxonomy import rank_id
from .ref_read import RefRecord, get_tid, get_uid

REF_OVERLAP = 11  # last 11bp of a genome attribute to the next (bt2_idx.h:3508)


def _w32(f, v):
    f.write(struct.pack("<i", v))


def _wu64(f, v):
    f.write(struct.pack("<Q", v))


def compute_rstarts(szs: List[RefRecord]) -> np.ndarray:
    """(totlen, seq, fwoff) per nonzero fragment (szsToDisk)."""
    rows = []
    seq = 0
    off = 0
    totlen = 0
    for r in szs:
        if r.length == 0:
            continue
        if r.first:
            off = 0
        off += r.off
        if r.first:
            seq += 1
        rows.append((totlen, seq - 1, off))
        totlen += r.length
        off += r.length
    return np.array(rows, dtype=np.uint64).reshape(-1, 3)


def build_arrays(codes: np.ndarray, sa: np.ndarray, szs: List[RefRecord],
                 plen: List[int], offrate: int = 4, ftab_chars: int = 10,
                 line_rate: int = 7):
    """All derived index arrays from the text + suffix array.

    Returns a dict with: bwt (codes incl. $ as 0), zoff, fchr, sides
    (packed bytes), ftab, eftab, offs (SA-sample tidx), boundary list.
    """
    n = codes.shape[0]
    npat = sum(1 for r in szs if r.first and r.length > 0)
    rstarts = compute_rstarts(szs)

    # ---- BWT ----
    bwt = np.empty(n + 1, dtype=np.uint8)
    prev = sa - 1
    zoff = int(np.nonzero(sa == 0)[0][0])
    bwt_idx = np.where(prev >= 0, prev, 0)
    bwt = codes[np.minimum(bwt_idx, n - 1)].copy()
    bwt[zoff] = 0  # '$' stored as code 0, not counted

    # ---- fchr (cumulative char counts; $ excluded) ----
    counts = np.bincount(codes, minlength=4).astype(np.uint64)
    fchr = np.zeros(5, dtype=np.uint64)
    fchr[1:] = np.cumsum(counts)

    # ---- packed sides with occ checkpoints ----
    side_sz = 1 << line_rate
    side_bwt_sz = side_sz - 32        # 4 x u64 checkpoints
    side_bwt_len = side_bwt_sz * 4    # bases per side
    bwt_bytes_needed = n // 4 + 1
    num_sides = (bwt_bytes_needed + side_bwt_sz - 1) // side_bwt_sz
    total_bases = num_sides * side_bwt_len
    padded = np.zeros(total_bases, dtype=np.uint8)
    padded[: n + 1] = bwt
    # pack 4 bases/byte little-endian bit pairs
    q = padded.reshape(-1, 4).astype(np.uint16)
    packed = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)
              ).astype(np.uint8)
    payload = packed.reshape(num_sides, side_bwt_sz)
    # checkpoints: counts of each char in rows < side start, excluding $
    # (the $ is code 0 but flagged "count=false", bt2_idx.h:3574-3580;
    # padding rows after len count as 'A' but only land after the final
    # checkpoint, so a plain masked cumsum is exact)
    occ_rows = padded.reshape(num_sides, side_bwt_len)
    valid = np.arange(total_bases).reshape(num_sides, side_bwt_len) <= n
    valid[np.unravel_index(zoff, (num_sides, side_bwt_len))] = False
    cum = np.zeros((num_sides, 4), dtype=np.uint64)
    for c in range(4):
        per_side = ((occ_rows == c) & valid).sum(axis=1).astype(np.uint64)
        cum[1:, c] = np.cumsum(per_side)[:-1]
    # pad rows beyond n count as A for occ (count=true in the loop) --
    # but rows > n only exist in the final side whose checkpoint is the
    # counts before it, so nothing more to add.
    sides = np.empty(num_sides * side_sz, dtype=np.uint8)
    sv = sides.reshape(num_sides, side_sz)
    sv[:, :side_bwt_sz] = payload
    sv[:, side_bwt_sz:] = cum.astype("<u8").view(np.uint8).reshape(num_sides, 32)

    # ---- ftab / eftab ----
    ftab_len = (1 << (2 * ftab_chars)) + 1
    suf_len = n - sa  # length of each suffix (sa==n -> 0)
    is_long = suf_len >= ftab_chars
    # pack the first ftab_chars chars of each long suffix
    long_pos = sa[is_long].astype(np.int64)
    suf_int = np.zeros(long_pos.shape[0], dtype=np.int64)
    for i in range(ftab_chars):
        suf_int = (suf_int << 2) | codes[long_pos + i].astype(np.int64)
    count = np.bincount(suf_int + 1, minlength=ftab_len).astype(np.uint64)
    # absorb short suffixes into the next long row's sufInt
    absorb = np.zeros(ftab_len, dtype=np.uint64)
    short_rows = np.nonzero(~is_long)[0]
    long_rows = np.nonzero(is_long)[0]
    if short_rows.shape[0]:
        # map each short row to the index (within long_rows) of the next
        # long row; rows past the last long row absorb into ftab_len-1
        nxt = np.searchsorted(long_rows, short_rows)
        long_sufint_padded = np.concatenate(
            [suf_int, [np.int64(ftab_len - 1)]])
        tgt = long_sufint_padded[np.minimum(nxt, long_rows.shape[0])]
        np.add.at(absorb, tgt, 1)
    # the reference's prefix-sum loop starts at i=1 and never reads
    # absorbFtab[0], so shorts absorbed there are dropped (the guarding
    # assert is compiled out in release builds) -- reproduce that
    absorb[0] = 0
    running = np.cumsum(count + absorb).astype(np.uint64)
    lo = running - absorb
    ftab = running.copy()
    eftab_len = 2 * ftab_chars
    eftab = np.zeros(eftab_len, dtype=np.uint64)
    abs_idx = np.nonzero(absorb > 0)[0]
    for k, i in enumerate(abs_idx):
        eftab[2 * k] = lo[i]
        eftab[2 * k + 1] = running[i]
        ftab[i] = np.uint64(k) ^ np.uint64(0xFFFFFFFFFFFFFFFF)
    ftab[0] = 0

    # ---- SA-sample tidx (.2.cf values) ----
    sampled_rows = np.arange(0, n + 1, 1 << offrate)
    s_elt = sa[sampled_rows]
    adj = s_elt + REF_OVERLAP
    adj = np.where(adj >= n, s_elt, adj)
    adj = np.where(adj >= n, adj - 1, adj)
    frag = np.searchsorted(rstarts[:, 0], adj, side="right") - 1
    tidx = rstarts[np.maximum(frag, 0), 1]
    tidx = np.where(s_elt == 0, 0, tidx)

    # ---- .4.cf boundary map ----
    # joined offsets of sequence starts minus the overlap (clamped)
    seq_start = rstarts[:, 2] == 0
    starts = rstarts[seq_start, 0].astype(np.int64)
    ref_idx = np.arange(npat, dtype=np.uint32)
    marks = np.maximum(starts - REF_OVERLAP, 0).astype(np.uint64)
    # rows whose saElt is a marked offset
    mark_map = {int(m): int(r) for m, r in zip(marks, ref_idx)}
    mark_sorted = np.array(sorted(mark_map), dtype=np.int64)
    pos = np.searchsorted(mark_sorted, sa)
    posc = np.minimum(pos, mark_sorted.shape[0] - 1)
    hit = mark_sorted[posc] == sa
    b_rows = np.nonzero(hit)[0].astype(np.uint64)
    b_refs = np.array([mark_map[int(sa[r])] for r in b_rows], dtype=np.uint32)

    return dict(zoff=zoff, fchr=fchr, sides=sides, ftab=ftab, eftab=eftab,
                offs_tidx=tidx, boundary=(b_rows, b_refs), rstarts=rstarts,
                npat=npat, num_sides=num_sides)


def write_index(basename: str, codes: np.ndarray, sa: np.ndarray,
                szs: List[RefRecord], refnames: List[str], plen: List[int],
                conversion_table: str, taxonomy_tree: str,
                name_table: str = "", size_table: str = "",
                offrate: int = 4, ftab_chars: int = 10,
                line_rate: int = 7) -> None:
    """Write basename.{1,2,3,4}.cf byte-identically to the reference."""
    n = codes.shape[0]
    arrs = build_arrays(codes, sa, szs, plen, offrate, ftab_chars, line_rate)
    npat = arrs["npat"]
    rstarts = arrs["rstarts"]

    with open(basename + ".1.cf", "wb") as f1:
        _w32(f1, 1)
        _wu64(f1, n)
        _w32(f1, line_rate)
        _w32(f1, 2)  # legacy linesPerSide
        _w32(f1, offrate)
        _w32(f1, ftab_chars)
        _w32(f1, -1)  # -(flags=1): no color, no entire-reverse
        _wu64(f1, npat)
        np.asarray(plen, dtype="<u8").tofile(f1)
        _wu64(f1, rstarts.shape[0])
        rstarts.astype("<u8").tofile(f1)
        arrs["sides"].tofile(f1)
        _wu64(f1, arrs["zoff"])
        arrs["fchr"].astype("<u8").tofile(f1)
        arrs["ftab"].astype("<u8").tofile(f1)
        arrs["eftab"].astype("<u8").tofile(f1)
        for name in refnames:
            f1.write(name.encode() + b"\n")
        f1.write(b"\x00")

    with open(basename + ".2.cf", "wb") as f2:
        _w32(f2, 1)
        wide = npat > 0xFFFF
        arrs["offs_tidx"].astype("<u4" if wide else "<u2").tofile(f2)

    b_rows, b_refs = arrs["boundary"]
    with open(basename + ".4.cf", "wb") as f4:
        _w32(f4, 1)
        _wu64(f4, b_rows.shape[0])
        inter = np.empty(b_rows.shape[0] * 3, dtype="<u4")
        inter[0::3] = (b_rows & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        inter[1::3] = (b_rows >> np.uint64(32)).astype(np.uint32)
        inter[2::3] = b_refs
        inter.tofile(f4)

    write_taxonomy_payload(basename + ".3.cf", refnames, plen,
                           conversion_table, taxonomy_tree, name_table,
                           size_table)


def write_taxonomy_payload(path: str, refnames: List[str], plen: List[int],
                           conversion_table: str, taxonomy_tree: str,
                           name_table: str, size_table: str) -> None:
    """.3.cf writer (bt2_idx.h:1330-1506)."""
    uids = [get_uid(r) for r in refnames]
    uid_set = set(uids)
    uid_to_tid: Dict[str, int] = {}
    with open(conversion_table) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2 or parts[0].startswith("#"):
                continue
            uid, stid = parts[0], parts[1]
            if uid not in uid_set or uid in uid_to_tid:
                continue
            uid_to_tid[uid] = get_tid(stid)

    # pruned tree: closure of classified tids up to the root
    tree: Dict[int, Tuple[int, int]] = {}
    with open(taxonomy_tree) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            toks = line.split()
            # format: tid | parent | rank-first-token ...
            try:
                tid = int(toks[0])
                parent = int(toks[2])
                rank = rank_id(toks[4]) if len(toks) > 4 else 0
            except (ValueError, IndexError):
                continue
            if tid in tree:
                continue
            tree[tid] = (parent, rank)

    tids = sorted({uid_to_tid[u] for u in uids if u in uid_to_tid})
    color = set()
    for tid in tids:
        t = tid
        while t in tree:
            color.add(t)
            parent = tree[t][0]
            if parent == t:
                break
            t = parent

    # names: only scientific names of colored tids, '@' for spaces
    names: Dict[int, str] = {}
    if name_table:
        with open(name_table) as f:
            for line in f:
                if not line.strip() or line.startswith("#"):
                    continue
                if "scientific name" not in line:
                    continue
                toks = line.split()
                try:
                    tid = int(toks[0])
                except ValueError:
                    continue
                if tid not in color:
                    continue
                # tokens: tid | name-part [name-part...] |
                parts = []
                for tok in toks[2:]:
                    if tok == "|":
                        break
                    parts.append(tok)
                names[tid] = "@".join(parts)

    # sizes: per-tid sum of sequence lengths, then size-table overrides
    sizes: Dict[int, int] = {}
    for uid, contig_len in zip(uids, plen):
        if uid not in uid_to_tid:
            continue
        tid = uid_to_tid[uid]
        sizes[tid] = sizes.get(tid, 0) + int(contig_len)
    if size_table:
        with open(size_table) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2 or parts[0].startswith("#"):
                    continue
                sizes[get_tid(parts[0])] = int(parts[1])

    with open(path, "wb") as f3:
        _w32(f3, 1)
        _wu64(f3, len(refnames))
        for uid in uids:
            f3.write(uid.encode() + b"\x00")
            _wu64(f3, uid_to_tid.get(uid, 0))
        _wu64(f3, len(color))
        for tid in sorted(color):
            parent, rank = tree[tid]
            _wu64(f3, tid)
            _wu64(f3, parent)
            f3.write(struct.pack("<H", rank))
        _wu64(f3, len(names))
        for tid in sorted(names):
            _wu64(f3, tid)
            f3.write(names[tid].encode() + b"\n")
        _wu64(f3, len(sizes))
        for tid in sorted(sizes):
            _wu64(f3, tid)
            _wu64(f3, sizes[tid])
