"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the 2-D (dp x fm) sharded device step -- reads data-parallel,
BWT row-range sharded with psum rank reconstitution -- produces bit-identical
search results to the single-chip engine.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from centrifuge_tpu.classify.engine import BatchSearchEngine, batched_search
from centrifuge_tpu.io.fastx import read_batch
from centrifuge_tpu.ops.fm_jax import DeviceFMIndex, make_resolver
from centrifuge_tpu.parallel.sharded import (ShardedFMArrays,
                                             make_sharded_step, pad_lanes)

from conftest import fixture_path


def _lanes_from_reads(n=32):
    recs = read_batch([fixture_path("synth", "reads.fq")], limit=n)
    seqs = []
    for r in recs:
        seqs.append(r.seq)
        seqs.append(r.revcomp())
    L = len(seqs)
    lmax = max(len(s) for s in seqs)
    rseq = np.zeros((L, lmax + 10), dtype=np.int32)
    lengths = np.zeros(L, dtype=np.int32)
    for i, s in enumerate(seqs):
        lengths[i] = len(s)
        rseq[i, : len(s)] = s[::-1].astype(np.int32)
    return rseq, lengths, np.zeros(L, dtype=np.int32)


@pytest.mark.parametrize("dp,fm", [(4, 2), (2, 4), (8, 1)])
def test_sharded_step_matches_single_chip(synth_index, dp, fm):
    devices = jax.devices()
    assert len(devices) >= dp * fm, "conftest must force 8 CPU devices"
    mesh = Mesh(np.array(devices[: dp * fm]).reshape(dp, fm), ("dp", "fm"))

    max_hits = 8
    rseq, lengths, start = _lanes_from_reads(n=24)
    rseq, lengths, start = pad_lanes(rseq, lengths, start, dp)

    sh = ShardedFMArrays.build(synth_index, fm)
    step = make_sharded_step(mesh, sh, min_hitlen=22, max_hits=max_hits)
    s_top, s_bot, s_off, s_len, s_n, s_sums, s_tidx, reads_done = [
        np.asarray(x) for x in step(rseq, lengths, start)]

    dfm = DeviceFMIndex.build(synth_index)
    r_top, r_bot, r_off, r_len, r_n, r_sums = [
        np.asarray(x)
        for x in batched_search(
            dfm.blocks, dfm.fchr, dfm.ftab_tb,
            np.int32(dfm.zoff), rseq, lengths, start,
            min_hitlen=22, increment=11, max_hits=max_hits,
            first_hit_only=False)]

    np.testing.assert_array_equal(s_n, r_n)
    np.testing.assert_array_equal(s_sums, r_sums)
    # compare only the live hit slots
    for lane in range(rseq.shape[0]):
        k = min(int(r_n[lane]), max_hits)
        np.testing.assert_array_equal(s_top[lane, :k], r_top[lane, :k])
        np.testing.assert_array_equal(s_bot[lane, :k], r_bot[lane, :k])
        np.testing.assert_array_equal(s_off[lane, :k], r_off[lane, :k])
        np.testing.assert_array_equal(s_len[lane, :k], r_len[lane, :k])

    assert reads_done == int((lengths > 0).sum())

    # sharded SA resolution of hit tops == single-chip resolver
    resolver = make_resolver(dfm)
    for lane in range(rseq.shape[0]):
        k = min(int(r_n[lane]), max_hits)
        rows = r_top[lane, :k]
        live = rows >= 0
        if not live.any():
            continue
        want = np.asarray(resolver(np.where(live, rows, 0).astype(np.int32)))
        got = s_tidx[lane, :k]
        np.testing.assert_array_equal(got[live], want[live])


def test_graft_entry_contract():
    """entry() compiles single-chip; dryrun_multichip runs on the cpu mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", fixture_path("..", "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    mod.dryrun_multichip(8)
