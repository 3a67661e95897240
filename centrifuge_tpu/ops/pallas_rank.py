"""Pallas TPU rank kernel: VMEM-resident BWT blocks.

For indexes whose packed block table fits in VMEM (<= ~12 MB, i.e. up to
~40 Mbp of reference), the whole table can live on-chip and a rank batch
needs no HBM traffic at all. The kernel tiles the query batch over the
grid, keeps the table in VMEM across grid steps, and answers each query
with a dynamic-slice row read + the 2-bit XOR/popcount reduction
(the vector analog of the reference's countUpTo, bt2_idx.h:2364-2425).

MEASURED CONCLUSION (v5e, 2026-08): this kernel compiles and matches the
XLA path bit-for-bit in interpret mode, but Mosaic cannot lower the
per-lane dynamic row read ("Cannot do int indexing on TPU") -- the TPU
has no vector-gather unit, in VMEM or HBM. The alternatives all lose:

  * scalar fori_loop row reads: serializes the tile (~100x slower);
  * MXU one-hot matmul-gather (split into exact 16-bit f32 halves):
    breaks even with the XLA gather only for tables under ~1k blocks
    and scales linearly worse with index size;
  * XLA's native gather: ~50us per batched op regardless of row count
    (latency-bound), which is why the production engine merges the
    top/bot/char lookups into ONE gather per step (engine.lf_pair).

The production search path therefore deliberately uses XLA gathers;
this module stays as the validated experiment + the place a future
Mosaic gather primitive would slot in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fm_jax import WORDS_PER_BLOCK, _CHAR_PATTERNS

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

VMEM_TABLE_BUDGET = 12 * 1024 * 1024  # bytes of VMEM for the block table
LANE_TILE = 512


def pallas_rank_available(blocks_shape) -> bool:
    if not _HAVE_PALLAS:
        return False
    return blocks_shape[0] * blocks_shape[1] * 4 <= VMEM_TABLE_BUDGET


def _rank_kernel_body(rows_ref, chars_ref, table_ref, out_ref):
    """One grid step: LANE_TILE queries against the VMEM table.

    table: (nblk, 36) uint32 rows [occ[4] | words[32]] (narrow layout).
    """
    rows = rows_ref[:]                       # (LANE_TILE,) int32
    chars = chars_ref[:]
    blk = rows >> 9
    within = rows & 511

    # per-lane dynamic row reads; Mosaic lowers this gather on VMEM
    data = table_ref[blk]                    # (LANE_TILE, 36)
    occ = data[:, :4]
    words = data[:, 4:]

    # char -> repeated 2-bit pattern, computed inline (no captured consts)
    c32 = chars.astype(jnp.uint32)
    pat = c32 | (c32 << 2) | (c32 << 4) | (c32 << 6)
    pat = pat | (pat << 8)
    pat = pat | (pat << 16)
    patterns = pat[:, None]
    widx = jax.lax.broadcasted_iota(jnp.int32, (1, WORDS_PER_BLOCK), 1)
    nvalid = jnp.clip(within[:, None] - widx * 16, 0, 16)
    x = words ^ patterns
    y = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    shift = (2 * jnp.clip(nvalid, 0, 15)).astype(jnp.uint32)
    mask = jnp.where(nvalid >= 16, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << shift) - 1)
    cnt = jax.lax.population_count(y & mask).astype(jnp.int32).sum(
        axis=1, dtype=jnp.int32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], 1), 0)[:, 0]
    base = occ[lanes, chars].astype(jnp.int32)
    out_ref[:] = base + cnt


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rank(table: jax.Array, rows: jax.Array, chars: jax.Array,
                interpret: bool = False) -> jax.Array:
    """rank (occ-checkpoint + in-block popcount) WITHOUT the '$'
    adjustment -- the caller applies `- ((chars==0) & (zoff < rows))`.

    rows/chars: int32[B]; B must be a multiple of LANE_TILE.
    """
    B = rows.shape[0]
    grid = (B // LANE_TILE,)
    return pl.pallas_call(
        _rank_kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANE_TILE,), lambda i: (i,)),
            pl.BlockSpec((LANE_TILE,), lambda i: (i,)),
            pl.BlockSpec(table.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((LANE_TILE,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        interpret=interpret,
    )(rows, chars, table)


def rank_with_pallas(table, zoff, rows, chars, interpret=False):
    """Full rank_c(row) incl. the '$' exclusion, matching
    fm_jax.rank_kernel semantics on the narrow layout."""
    r = pallas_rank(table, rows, chars, interpret=interpret)
    adj = ((chars == 0) & (zoff < rows)).astype(jnp.int32)
    return r - adj
