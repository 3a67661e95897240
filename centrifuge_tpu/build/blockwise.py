"""Bounded-memory index build: blockwise SA (native) + streaming writer.

The reference builds nt-scale indexes in bounded RAM with a blockwise
suffix sorter driven by --bmax/--dcv (blockwise_sa.h, diff_sample.h,
centrifuge_build.cpp:92-98 defaults). This module is the equivalent:
`BlockwiseSA` drives build/blocksa.cpp (difference-cover sample +
rank-quantile buckets, O(bmax) per block), and `write_index_blockwise`
consumes the SA block stream emitting basename.{1,2,4}.cf byte-identically
to the in-memory writer (writer.py build_arrays) -- which is itself
byte-identical to the reference binary. Peak memory is
O(n/4 text + 2n bucket ids + n/4 sample ranks + 8*bmax block), vs
~16 B/base for the all-in-RAM SA-IS path. The text stays 2-bit packed
end-to-end (ref_read.PackedCodes: scan_fastas(packed=True) packs while
scanning, the writer fancy-indexes the packed buffer directly), so no
1 B/base uint8 codes array ever materializes on this path.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
from typing import Iterator, List

import numpy as np

from .ref_read import RefRecord
from .writer import (REF_OVERLAP, _w32, _wu64, compute_rstarts,
                     write_taxonomy_payload)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    from ..native.compile import build_native
    src = os.path.join(_HERE, "blocksa.cpp")
    lib = ctypes.CDLL(build_native(src, extra_flags=("-pthread",)))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.bsa_create.restype = ctypes.c_void_p
    lib.bsa_create.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int]
    lib.bsa_num_blocks.restype = ctypes.c_int64
    lib.bsa_num_blocks.argtypes = [ctypes.c_void_p]
    lib.bsa_block_size.restype = ctypes.c_int64
    lib.bsa_block_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.bsa_block.restype = ctypes.c_int64
    lib.bsa_block.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p,
                              ctypes.c_int64]
    lib.bsa_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


_EMIT = None


def _load_emit():
    global _EMIT
    if _EMIT is not None:
        return _EMIT
    from ..native.compile import build_native
    src = os.path.join(_HERE, "emit.cpp")
    lib = ctypes.CDLL(build_native(src))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.emit_create.restype = ctypes.c_void_p
    lib.emit_create.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int64, u64p, u64p, ctypes.c_int64, i64p, u32p,
        ctypes.c_int64, u64p, u64p, u32p, ctypes.c_char_p]
    lib.emit_feed.restype = ctypes.c_int64
    lib.emit_feed.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int64]
    lib.emit_finish.argtypes = [
        ctypes.c_void_p, u64p, u64p, u64p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.emit_free.argtypes = [ctypes.c_void_p]
    _EMIT = lib
    return lib


class BlockwiseSA:
    """Iterate the suffix array of `codes` in sorted O(bmax) blocks."""

    def __init__(self, codes, bmax: int, dcv: int = 1024,
                 nthreads: int = None):
        if dcv & (dcv - 1) or dcv < 16:
            raise ValueError("--dcv must be a power of 2 >= 16")
        lib = _load_native()
        from .ref_read import PackedCodes
        n = codes.shape[0]
        if isinstance(codes, PackedCodes):
            # already 2-bit packed (+16 pad bytes): hand the buffer over
            self._packed = np.ascontiguousarray(codes.packed)
        else:
            # 2-bit pack with tail padding for the 64-bit fetches
            npad = (n + 3) // 4 + 16
            q = np.zeros(((n + 3) // 4) * 4, np.uint8)
            q[:n] = codes
            q = q.reshape(-1, 4)
            self._packed = np.zeros(npad, np.uint8)
            self._packed[: q.shape[0]] = (
                q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6))
        self.n = n
        self.lib = lib
        self.ctx = lib.bsa_create(self._packed, n, dcv, bmax,
                                  nthreads or os.cpu_count() or 1)
        self.nblocks = lib.bsa_num_blocks(self.ctx)

    def blocks(self) -> Iterator[np.ndarray]:
        """Yield each sorted SA block as a VIEW of one reused buffer.

        Consumers must finish with a block before advancing the iterator
        (StreamingIndexWriter.feed consumes synchronously: the native
        emit returns after processing, and the numpy path's astype()
        copies) -- the old per-block defensive .copy() was an extra
        8*bmax bytes of peak RSS (~12 GB at 12 Gbp / bmaxdivn 8)."""
        buf_cap = 0
        buf = None
        for b in range(self.nblocks):
            need = self.lib.bsa_block_size(self.ctx, b)
            if need > buf_cap:
                buf_cap = int(need) + 64
                buf = np.empty(buf_cap, np.int64)
            k = self.lib.bsa_block(self.ctx, b, buf, buf_cap)
            assert k == need, (k, need)
            yield buf[:k]

    def close(self):
        if self.ctx:
            self.lib.bsa_free(self.ctx)
            self.ctx = None

    def __del__(self):
        self.close()


class StreamingIndexWriter:
    """Consume SA blocks in order, emitting .1/.2/.4.cf byte-identically
    to writer.build_arrays + write_index (which match the reference).

    All per-row logic of buildToDisk (bt2_idx.h:3379-3860) is expressed
    as vectorized numpy over each block: BWT chars, side packing with occ
    checkpoints, ftab counts with short-suffix absorption, the SA-sample
    tidx stream, and the genome-boundary map.

    When the text arrives 2-bit packed (PackedCodes, the bounded-memory
    path) the per-block pass runs in native C++ (build/emit.cpp,
    byte-identical; measured ~300x the numpy feed, which spends ~2 us/row
    in the per-side Python loop). native=False forces the numpy oracle.
    """

    def __init__(self, basename: str, codes: np.ndarray,
                 szs: List[RefRecord], refnames: List[str],
                 plen: List[int], offrate: int = 4, ftab_chars: int = 10,
                 line_rate: int = 7, native: bool = None):
        self.codes = codes
        self.n = int(codes.shape[0])
        self.offrate = offrate
        self.ftab_chars = ftab_chars
        self.line_rate = line_rate
        self.refnames = refnames
        self.plen = plen
        self.rstarts = compute_rstarts(szs)
        self.npat = sum(1 for r in szs if r.first and r.length > 0)

        n = self.n
        self.side_sz = 1 << line_rate
        self.side_bwt_sz = self.side_sz - 32
        side_bwt_len = self.side_bwt_sz * 4
        bwt_bytes_needed = n // 4 + 1
        self.num_sides = (bwt_bytes_needed + self.side_bwt_sz - 1) \
            // self.side_bwt_sz
        self.total_bases = self.num_sides * side_bwt_len

        # running state
        self.row = 0                     # global SA row index
        self.zoff = -1
        self.occ = np.zeros(4, np.uint64)       # chars emitted so far ($ excl)
        self.cur_side = np.zeros(side_bwt_len, np.uint8)  # base codes
        self.side_fill = 0
        ftab_len = (1 << (2 * ftab_chars)) + 1
        self.ftab_count = np.zeros(ftab_len, np.uint64)
        self.absorb = np.zeros(ftab_len, np.uint64)
        self.pending_short = 0
        self.offs_vals: List[np.ndarray] = []
        self.b_rows: List[np.ndarray] = []
        self.b_refs: List[np.ndarray] = []
        mark_start = self.rstarts[:, 2] == 0
        starts = self.rstarts[mark_start, 0].astype(np.int64)
        marks = np.maximum(starts - REF_OVERLAP, 0)
        order = np.argsort(marks, kind="stable")
        self.mark_sorted = marks[order]
        self.mark_refs = np.arange(self.npat, dtype=np.uint32)[order]

        self.f1 = open(basename + ".1.cf", "wb")
        self._write_header()
        self.basename = basename

        from .ref_read import PackedCodes
        if native is None:
            native = isinstance(codes, PackedCodes)
        self._emit = None
        if native:
            if not isinstance(codes, PackedCodes):
                codes = PackedCodes.from_codes(np.asarray(codes))
            lib = _load_emit()
            # close the header so the native appends land after it
            self.f1.close()
            self.f1 = None
            self._emit_lib = lib
            step = 1 << offrate
            self._offs_buf = np.zeros((n + 1 + step - 1) // step + 2,
                                      np.uint64)
            self._brow_buf = np.zeros(self.mark_sorted.shape[0] + 1,
                                      np.uint64)
            self._bref_buf = np.zeros(self.mark_sorted.shape[0] + 1,
                                      np.uint32)
            self._rj = np.ascontiguousarray(self.rstarts[:, 0],
                                            dtype=np.uint64)
            self._rt = np.ascontiguousarray(self.rstarts[:, 1],
                                            dtype=np.uint64)
            self._marks_c = np.ascontiguousarray(self.mark_sorted,
                                                 dtype=np.int64)
            self._mrefs_c = np.ascontiguousarray(self.mark_refs,
                                                 dtype=np.uint32)
            self._packed_ref = np.ascontiguousarray(codes.packed)
            self._emit = lib.emit_create(
                self._packed_ref, n, offrate, ftab_chars, REF_OVERLAP,
                side_bwt_len, self._rj, self._rt, self.rstarts.shape[0],
                self._marks_c, self._mrefs_c, self._marks_c.shape[0],
                self._offs_buf, self._brow_buf, self._bref_buf,
                (basename + ".1.cf").encode())
            if not self._emit:
                raise OSError("emit_create: cannot reopen " + basename
                              + ".1.cf")

    def _write_header(self):
        f1, n = self.f1, self.n
        _w32(f1, 1)
        _wu64(f1, n)
        _w32(f1, self.line_rate)
        _w32(f1, 2)
        _w32(f1, self.offrate)
        _w32(f1, self.ftab_chars)
        _w32(f1, -1)
        _wu64(f1, self.npat)
        np.asarray(self.plen, dtype="<u8").tofile(f1)
        _wu64(f1, self.rstarts.shape[0])
        self.rstarts.astype("<u8").tofile(f1)

    def _flush_side(self):
        """Pack the filled side + its checkpoint and write it."""
        side_bwt_len = self.side_bwt_sz * 4
        q = self.cur_side.reshape(-1, 4).astype(np.uint16)
        packed = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
                  | (q[:, 3] << 6)).astype(np.uint8)
        self.f1.write(packed.tobytes())
        self.f1.write(self._side_occ.astype("<u8").tobytes())
        self.cur_side[:] = 0
        self.side_fill = 0

    def feed(self, sa_block: np.ndarray) -> None:
        if self._emit is not None:
            sa = np.ascontiguousarray(sa_block, dtype=np.int64)
            k = self._emit_lib.emit_feed(self._emit, sa, sa.shape[0])
            assert k == sa.shape[0]
            self.row += int(k)
            return
        codes, n = self.codes, self.n
        sa = sa_block.astype(np.int64)
        r0 = self.row
        k = sa.shape[0]

        # ---- BWT chars of this block ----
        prev = sa - 1
        chars = codes[np.clip(prev, 0, n - 1)].astype(np.uint8)
        z_local = np.nonzero(sa == 0)[0]
        if z_local.shape[0]:
            self.zoff = r0 + int(z_local[0])
            chars[z_local[0]] = 0

        # ---- side packing with occ checkpoints ----
        side_bwt_len = self.side_bwt_sz * 4
        pos = 0
        counts_mask = np.ones(k, bool)
        if z_local.shape[0]:
            counts_mask[z_local[0]] = False
        while pos < k:
            if self.side_fill == 0:
                self._side_occ = self.occ.copy()
            take = min(side_bwt_len - self.side_fill, k - pos)
            seg = chars[pos: pos + take]
            self.cur_side[self.side_fill: self.side_fill + take] = seg
            mseg = counts_mask[pos: pos + take]
            cc = np.bincount(seg[mseg], minlength=4).astype(np.uint64)
            self.occ += cc
            self.side_fill += take
            pos += take
            if self.side_fill == side_bwt_len:
                self._flush_side()

        # ---- ftab counts + short-suffix absorption ----
        fc = self.ftab_chars
        suf_len = n - sa
        is_long = suf_len >= fc
        long_pos = sa[is_long]
        if long_pos.shape[0]:
            suf_int = np.zeros(long_pos.shape[0], np.int64)
            for i in range(fc):
                suf_int = (suf_int << 2) | codes[long_pos + i].astype(np.int64)
            np.add.at(self.ftab_count, suf_int + 1, 1)
            # shorts absorb into the NEXT long row's sufInt; a short run
            # can span blocks, so carry `pending_short`
            # pending shorts from earlier rows absorb into this block's
            # first long row
            self.absorb[suf_int[0]] += self.pending_short
            self.pending_short = 0
            # within-block shorts
            short_rows = np.nonzero(~is_long)[0]
            if short_rows.shape[0]:
                long_rows = np.nonzero(is_long)[0]
                nxt = np.searchsorted(long_rows, short_rows)
                tail = nxt >= long_rows.shape[0]
                inb = ~tail
                if inb.any():
                    np.add.at(self.absorb, suf_int[nxt[inb]], 1)
                self.pending_short += int(tail.sum())
        else:
            self.pending_short += k

        # ---- SA-sample tidx ----
        step = 1 << self.offrate
        first = (-r0) % step
        samp_local = np.arange(first, k, step)
        if samp_local.shape[0]:
            s_elt = sa[samp_local]
            adj = s_elt + REF_OVERLAP
            adj = np.where(adj >= n, s_elt, adj)
            adj = np.where(adj >= n, adj - 1, adj)
            frag = np.searchsorted(
                self.rstarts[:, 0].astype(np.int64), adj,
                side="right") - 1
            tidx = self.rstarts[np.maximum(frag, 0), 1]
            tidx = np.where(s_elt == 0, 0, tidx)
            self.offs_vals.append(tidx.astype(np.uint64))

        # ---- boundary map ----
        p2 = np.searchsorted(self.mark_sorted, sa)
        pc = np.minimum(p2, self.mark_sorted.shape[0] - 1)
        hit = self.mark_sorted[pc] == sa
        hrows = np.nonzero(hit)[0]
        if hrows.shape[0]:
            self.b_rows.append((r0 + hrows).astype(np.uint64))
            self.b_refs.append(self.mark_refs[pc[hrows]])

        self.row += k

    def finish(self, conversion_table: str, taxonomy_tree: str,
               name_table: str = "", size_table: str = "") -> None:
        assert self.row == self.n + 1, (self.row, self.n)
        if self._emit is not None:
            # collect the native state; the final (padded) side is
            # flushed and the file closed by emit_finish
            lib = self._emit_lib
            zoff = ctypes.c_int64()
            offs_count = ctypes.c_int64()
            nb = ctypes.c_int64()
            pend = ctypes.c_int64()
            row = ctypes.c_int64()
            lib.emit_finish(self._emit, self.ftab_count, self.absorb,
                            self.occ, ctypes.byref(zoff),
                            ctypes.byref(offs_count), ctypes.byref(nb),
                            ctypes.byref(pend), ctypes.byref(row))
            lib.emit_free(self._emit)
            self._emit = None
            assert int(row.value) == self.n + 1
            self.zoff = int(zoff.value)
            self.pending_short = int(pend.value)
            self.offs_vals = [self._offs_buf[: int(offs_count.value)]]
            self.b_rows = [self._brow_buf[: int(nb.value)]]
            self.b_refs = [self._bref_buf[: int(nb.value)]]
            self.f1 = open(self.basename + ".1.cf", "ab")
        assert self.zoff >= 0
        # pad + flush the final side (padding counts as 'A' but lands
        # after the final checkpoint, mirroring build_arrays)
        if self.side_fill > 0:
            self._flush_side()

        # ftab finalization (identical to build_arrays)
        ftab_len = self.ftab_count.shape[0]
        # shorts after the last long row absorb into the last ftab slot
        self.absorb[ftab_len - 1] += self.pending_short
        self.pending_short = 0
        self.absorb[0] = 0
        running = np.cumsum(self.ftab_count + self.absorb).astype(np.uint64)
        lo = running - self.absorb
        ftab = running.copy()
        eftab = np.zeros(2 * self.ftab_chars, np.uint64)
        abs_idx = np.nonzero(self.absorb > 0)[0]
        for k2, i in enumerate(abs_idx):
            eftab[2 * k2] = lo[i]
            eftab[2 * k2 + 1] = running[i]
            ftab[i] = np.uint64(k2) ^ np.uint64(0xFFFFFFFFFFFFFFFF)
        ftab[0] = 0

        f1 = self.f1
        _wu64(f1, self.zoff)
        fchr = np.zeros(5, np.uint64)
        fchr[1:] = np.cumsum(self.occ)
        fchr.astype("<u8").tofile(f1)
        ftab.astype("<u8").tofile(f1)
        eftab.astype("<u8").tofile(f1)
        for name in self.refnames:
            f1.write(name.encode() + b"\n")
        f1.write(b"\x00")
        f1.close()

        offs = (np.concatenate(self.offs_vals) if self.offs_vals
                else np.zeros(0, np.uint64))
        with open(self.basename + ".2.cf", "wb") as f2:
            _w32(f2, 1)
            wide = self.npat > 0xFFFF
            offs.astype("<u4" if wide else "<u2").tofile(f2)

        b_rows = (np.concatenate(self.b_rows) if self.b_rows
                  else np.zeros(0, np.uint64))
        b_refs = (np.concatenate(self.b_refs) if self.b_refs
                  else np.zeros(0, np.uint32))
        with open(self.basename + ".4.cf", "wb") as f4:
            _w32(f4, 1)
            _wu64(f4, b_rows.shape[0])
            inter = np.empty(b_rows.shape[0] * 3, dtype="<u4")
            inter[0::3] = (b_rows & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            inter[1::3] = (b_rows >> np.uint64(32)).astype(np.uint32)
            inter[2::3] = b_refs
            inter.tofile(f4)

        write_taxonomy_payload(self.basename + ".3.cf", self.refnames,
                               self.plen, conversion_table, taxonomy_tree,
                               name_table, size_table)


def _vmhwm_bytes() -> int:
    """Peak RSS (VmHWM) of this process in bytes; 0 if unreadable."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def _reset_vmhwm() -> bool:
    """Reset the kernel's peak-RSS watermark so each build phase can
    report its OWN peak (writing '5' to clear_refs resets VmHWM)."""
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
        return True
    except OSError:
        return False


def write_index_blockwise(basename: str, codes: np.ndarray,
                          szs: List[RefRecord], refnames: List[str],
                          plen: List[int], conversion_table: str,
                          taxonomy_tree: str, name_table: str = "",
                          size_table: str = "", bmax: int = None,
                          dcv: int = 1024, offrate: int = 4,
                          ftab_chars: int = 10, line_rate: int = 7,
                          nthreads: int = None,
                          verbose: bool = False) -> None:
    """Bounded-memory build: SA in O(bmax) blocks, streamed emission.

    bmax defaults to the reference's bmaxDivN=4 rule
    (centrifuge_build.cpp:92-98): n/4 suffixes per block.

    With verbose=True each phase reports its own peak RSS (B/base) --
    sample-rank/bucket construction, block sort+emit, finish -- so the
    builder's memory budget (blocksa.cpp:28-32, ~2.6 B/base predicted)
    is auditable separately from whatever else the process did before
    (e.g. DB generation, which round-3 lumped into one 5.16 B/base
    number)."""
    import time as _t
    n = codes.shape[0]
    if bmax is None:
        bmax = max(n // 4, 1 << 16)
    elif bmax < 0:
        # --bmaxdivn sentinel: block size = n / divisor
        bmax = max(n // (-bmax), 1 << 16)

    def phase(name, t0):
        if verbose:
            hwm = _vmhwm_bytes()
            print(f"  [build-rss] {name}: peak {hwm/2**30:.2f} GiB "
                  f"= {hwm/n:.2f} B/base ({_t.time()-t0:.1f}s)",
                  flush=True)
            _reset_vmhwm()

    if verbose and not _reset_vmhwm():
        print("  [build-rss] VmHWM reset unavailable; phase peaks are "
              "cumulative", flush=True)
    t0 = _t.time()
    bsa = BlockwiseSA(codes, bmax=bmax, dcv=dcv, nthreads=nthreads)
    phase("sample-rank+buckets", t0)
    t0 = _t.time()
    w = StreamingIndexWriter(basename, codes, szs, refnames, plen,
                             offrate, ftab_chars, line_rate)
    for blk in bsa.blocks():
        w.feed(blk)
    bsa.close()
    phase("block sort+emit", t0)
    t0 = _t.time()
    w.finish(conversion_table, taxonomy_tree, name_table, size_table)
    phase("finish(taxonomy+ftab)", t0)


def write_index_from_sa(basename: str, codes: np.ndarray, sa: np.ndarray,
                        szs: List[RefRecord], refnames: List[str],
                        plen: List[int], conversion_table: str,
                        taxonomy_tree: str, name_table: str = "",
                        size_table: str = "", offrate: int = 4,
                        ftab_chars: int = 10, line_rate: int = 7,
                        slice_rows: int = 1 << 26) -> None:
    """Emit the index from an in-memory SA through the streaming writer.

    The vectorized one-shot writer (writer.build_arrays) allocates
    several SA-sized int64 temporaries -- ~5x 8 B/base on top of the SA
    itself, which OOMs 125 GB hosts at ~2 Gbp. Feeding the SA in slices
    keeps peak memory at codes + SA + O(slice)."""
    w = StreamingIndexWriter(basename, codes, szs, refnames, plen,
                             offrate, ftab_chars, line_rate, native=True)
    n1 = sa.shape[0]
    for lo in range(0, n1, slice_rows):
        w.feed(sa[lo: lo + slice_rows])
    w.finish(conversion_table, taxonomy_tree, name_table, size_table)
