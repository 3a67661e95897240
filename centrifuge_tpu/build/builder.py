"""Index builder driver: FASTA + taxonomy -> basename.{1,2,3,4}.cf.

The TPU-native equivalent of centrifuge-build (centrifuge_build.cpp:554,
driver at 399-545): scan references, build the suffix array (native
SA-IS), emit the FM index + taxonomy payload byte-identically to the
reference writer.
"""

from __future__ import annotations

import time
from typing import List, Optional

from .ref_read import scan_fastas
from .sa import suffix_array
from .writer import write_index


# above this size the all-in-RAM SA-IS (~16 B/base) would not fit typical
# hosts; switch to the bounded-memory blockwise path automatically
AUTO_BLOCKWISE_BASES = 1 << 31


def build_index(fasta_paths: List[str], basename: str,
                conversion_table: str, taxonomy_tree: str,
                name_table: str = "", size_table: str = "",
                offrate: int = 4, ftab_chars: int = 10,
                line_rate: int = 7, verbose: bool = False,
                bmax: Optional[int] = None, dcv: int = 1024,
                blockwise: Optional[bool] = None,
                nthreads: Optional[int] = None) -> None:
    t0 = time.time()
    # scan 2-bit packed (0.25 B/base): the blockwise path keeps the
    # packed text end-to-end; the small in-memory SA-IS path unpacks
    codes, szs, refnames, plen = scan_fastas(fasta_paths, packed=True)
    if verbose:
        print(f"  scanned {len(refnames)} sequences, "
              f"{codes.shape[0]} bases ({time.time()-t0:.1f}s)")
    if codes.shape[0] == 0:
        raise ValueError("no DNA sequence found in input")
    if blockwise is None:
        blockwise = bmax is not None \
            or codes.shape[0] >= AUTO_BLOCKWISE_BASES
    t0 = time.time()
    try:
        if not blockwise:
            codes = codes.unpack()
        if blockwise:
            from .blockwise import write_index_blockwise
            write_index_blockwise(
                basename, codes, szs, refnames, plen, conversion_table,
                taxonomy_tree, name_table, size_table, bmax=bmax, dcv=dcv,
                offrate=offrate, ftab_chars=ftab_chars,
                line_rate=line_rate, nthreads=nthreads, verbose=verbose)
            if verbose:
                print(f"  blockwise index written ({time.time()-t0:.1f}s)")
            return
        sa = suffix_array(codes)
        if verbose:
            print(f"  suffix array built ({time.time()-t0:.1f}s)")
        t0 = time.time()
        if codes.shape[0] >= (1 << 28):
            # the one-shot vectorized writer stacks several SA-sized
            # temporaries; stream the SA through the incremental writer
            from .blockwise import write_index_from_sa
            write_index_from_sa(
                basename, codes, sa, szs, refnames, plen,
                conversion_table, taxonomy_tree, name_table, size_table,
                offrate, ftab_chars, line_rate)
        else:
            write_index(basename, codes, sa, szs, refnames, plen,
                        conversion_table, taxonomy_tree, name_table,
                        size_table, offrate, ftab_chars, line_rate)
    except BaseException:
        # never leave a partial index behind (centrifuge_build.cpp:735-744)
        import os
        for ext in ("1", "2", "3", "4"):
            try:
                os.unlink(f"{basename}.{ext}.cf")
            except OSError:
                pass
        raise
    if verbose:
        print(f"  index written ({time.time()-t0:.1f}s)")
