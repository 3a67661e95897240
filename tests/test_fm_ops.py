"""Property tests: FM primitives vs brute force on the example index."""

import numpy as np
import pytest

from centrifuge_tpu.ops.fm_numpy import FMOracle
from test_cf_io import load_fasta_joined
from conftest import fixture_path


@pytest.fixture(scope="module")
def oracle(example_index):
    return FMOracle(example_index)


@pytest.fixture(scope="module")
def brute(example_index):
    """Brute-force SA of the example text; '$' sorts largest (bowtie order)."""
    text = load_fasta_joined(fixture_path("example", "test.fa")).astype(np.int16)
    n = len(text)
    t = np.concatenate([text, [np.int16(4)]])  # 4 > all codes = '$'
    sa = sorted(range(n + 1), key=lambda i: t[i:].tobytes())
    return t, np.array(sa)


def test_lf_matches_inverse_sa(oracle, brute):
    t, sa = brute
    inv = np.argsort(sa)
    n = len(sa) - 1
    for r in range(n + 1):
        s = sa[r]
        if s == 0:
            continue
        want = inv[s - 1]
        assert oracle.lf_row(r) == want


def test_rank_vectorized_matches_scalar(oracle):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, oracle.idx.bwt_len, size=200)
    chars = rng.integers(0, 4, size=200)
    vec = oracle.rank(rows, chars)
    for i in range(200):
        assert vec[i] == oracle.rank(int(rows[i]), int(chars[i]))


def test_ftab_matches_brute(oracle, brute):
    t, sa = brute
    n = len(sa) - 1
    rng = np.random.default_rng(1)
    text = t[:-1]
    for _ in range(50):
        start = int(rng.integers(0, n - 10))
        pat = text[start:start + 10].astype(np.uint8)
        top, bot = oracle.ftab_lookup(pat)
        # count suffixes beginning with pat
        cnt = 0
        pb = pat.astype(np.int16).tobytes()
        for s in sa:
            if t[s:s + 10].tobytes() == pb:
                cnt += 1
        assert bot - top == cnt


def test_resolution_identifies_sequence(oracle, brute):
    t, sa = brute
    idx = oracle.idx
    plen = idx.plen.astype(np.int64)
    bounds = np.cumsum(plen)
    n = len(sa) - 1
    rng = np.random.default_rng(2)
    for r in rng.integers(0, n + 1, size=100):
        pos = sa[int(r)]
        # the SA sample attributes positions within 11bp of a sequence end
        # to the *next* sequence (bt2_idx.h:3508,3640-3669)
        probe = min(pos + 11, n)
        tidx_want = int(np.searchsorted(bounds, probe, side="right"))
        if tidx_want >= idx.npat:
            tidx_want = idx.npat - 1
        got = oracle.resolve_row(int(r))
        assert got == tidx_want, (r, pos, got, tidx_want)


def test_resolve_two_phase_matches_core():
    """Two-phase walk: resolved keys must agree with the single-phase
    oracle; masked (-1) keys are exactly the rows the budget dropped.
    phase1_steps=8 + a tiny phase-2 width force real survivors AND
    overflow on the fixture index."""
    import jax.numpy as jnp
    import numpy as np
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.ops.fm_jax import (DeviceFMIndex, resolve_rows_core,
                                           resolve_rows_two_phase)
    import os
    fx = os.path.join(os.path.dirname(__file__), "fixtures", "synth")
    idx = load_cf_index(os.path.join(fx, "synth"))
    fm = DeviceFMIndex.build(idx)
    rng = np.random.default_rng(3)
    rows = jnp.asarray(rng.integers(0, idx.bwt_len, 512).astype(np.int32))
    args = (fm.blocks, fm.fchr, fm.offs, fm.boundary_rows,
            fm.boundary_refs, jnp.asarray(fm.zoff, fm.row_dtype))
    kw = dict(sample_mask=(1 << fm.offrate) - 1, offrate=fm.offrate,
              has_bounds=fm.boundary_rows.shape[0] > 0,
              narrow=fm.npat <= 0xFFFF)
    oracle = np.asarray(resolve_rows_core(*args, rows, max_steps=4096, **kw))
    k1, t1, k2, t2 = resolve_rows_two_phase(
        *args, rows, max_steps=4096, phase1_steps=8, phase2_frac=32, **kw)
    k1, t1, k2, t2 = map(np.asarray, (k1, t1, k2, t2))
    rows_np = np.asarray(rows)
    served = {}
    for k, t in zip(np.concatenate([k1, k2]), np.concatenate([t1, t2])):
        if k >= 0:
            served[int(k)] = int(t)
    n_served = 0
    for i, r in enumerate(rows_np):
        if int(r) in served:
            assert served[int(r)] == oracle[i], (r, served[int(r)], oracle[i])
            n_served += 1
    # phase 1 at 8 steps resolves ~half; the tiny W2 forces overflow, so
    # some rows must be served, some by phase 2, and some masked to -1
    assert n_served > 200
    assert (k2 >= 0).any(), "phase 2 produced nothing -- not exercised"
    assert n_served < len(rows_np), "nothing overflowed -- not exercised"


def test_engine_forced_two_phase_parity():
    """Force the two-phase presolve on the small index and check the
    full search_async/search_collect prefetch path still serves correct
    resolutions (missing keys fall back, never wrong values)."""
    import numpy as np
    import os
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex, make_resolver
    from centrifuge_tpu.classify.engine import BatchSearchEngine
    from centrifuge_tpu.io.fastx import read_batch
    fx = os.path.join(os.path.dirname(__file__), "fixtures", "synth")
    idx = load_cf_index(os.path.join(fx, "synth"))
    fm = DeviceFMIndex.build(idx)
    reads = read_batch([os.path.join(fx, "reads.fq")])[:64]
    seqs = []
    for r in reads:
        seqs.append(r.seq)
        seqs.append(r.revcomp())
    resolver = make_resolver(fm)

    def collect(engine):
        h = engine.search_async(seqs, presolve=True)
        return engine.search_collect(h, len(seqs))

    base = BatchSearchEngine(fm)
    arrays_a, pre_a = collect(base)
    forced = BatchSearchEngine(fm)
    forced.presolve_phase1_nblk = 0   # force the two-phase walk
    arrays_b, pre_b = collect(forced)
    for a, b in zip(arrays_a, arrays_b):
        np.testing.assert_array_equal(a, b)
    # every key the two-phase prefetch serves must agree with the oracle
    rows_b, tidx_b = pre_b
    keep = rows_b >= 0
    got = np.asarray(resolver(rows_b[keep].astype(np.int32)))
    np.testing.assert_array_equal(tidx_b[keep], got[: keep.sum()])


def test_pool_transport_parity():
    """The dense hit-pool transport (engine compact modes 3/4) must give
    byte-identical per-lane arrays to the plain packed transport,
    including when the pool budget truncates (all-junk reads emit ~13
    hits/lane > POOL_SLOTS_PER_LANE, forcing the overflow re-fetch)."""
    import os
    from centrifuge_tpu.classify.engine import BatchSearchEngine
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "synth")
    idx = load_cf_index(os.path.join(fx, "synth"))
    fm = DeviceFMIndex.build(idx)
    reads = read_batch([os.path.join(fx, "reads.fq")])[:32]
    seqs = []
    for r in reads:
        seqs.append(r.seq)
        seqs.append(r.revcomp())
    # junk tail: random 150bp reads emit ~13 hits/lane (restart every ~10
    # chars) > POOL_SLOTS_PER_LANE, so with a full power-of-two lane count
    # (no padding slack in the budget) the pool truncates
    rng = np.random.default_rng(3)
    seqs += [rng.integers(0, 4, 150).astype(np.uint8)
             for _ in range(1024 - len(seqs))]

    plain = BatchSearchEngine(fm)
    plain.pool_min_lanes = 1 << 30      # never pool
    pooled = BatchSearchEngine(fm)
    pooled.pool_min_lanes = 1           # always pool
    a = plain.search(seqs)
    b = pooled.search(seqs)
    # the workload must actually exceed the pool budget, or the
    # truncation/re-fetch path wasn't exercised
    from centrifuge_tpu.classify.engine import POOL_SLOTS_PER_LANE, _bucket
    total = int(np.minimum(np.asarray(a[4]), 16).sum())
    assert total > POOL_SLOTS_PER_LANE * _bucket(len(seqs))

    def check(a, b):
        # truncation re-fetches can widen the hit buffers (junk columns
        # beyond a lane's nhits are never read); compare the slots the
        # consumer actually reads (_states_from_arrays)
        np.testing.assert_array_equal(np.asarray(a[4]), np.asarray(b[4]))
        np.testing.assert_array_equal(np.asarray(a[5]), np.asarray(b[5]))
        nh = np.asarray(a[4])
        for k in range(4):
            x, y = np.asarray(a[k]), np.asarray(b[k])
            w = min(x.shape[1], y.shape[1])
            valid = np.arange(w)[None, :] < nh[:, None]
            np.testing.assert_array_equal(
                np.where(valid, x[:, :w], 0), np.where(valid, y[:, :w], 0))
            # nothing a consumer reads may live beyond the shared width
            assert (nh <= w).all()

    check(a, b)
    # the async path (what the pipeline uses) must agree too
    h = pooled.search_async(seqs, presolve=False)
    c, _ = pooled.search_collect(h, len(seqs))
    check(a, c)


def test_pool_mode5_size_saturation_poisons_lane():
    """Mode-5 pool records store hit sizes in 14 bits; a hit with size >=
    16383 must round-trip as a poisoned lane (nhits > mh) so the engine's
    overflow re-fetch recovers the exact values."""
    import jax.numpy as jnp
    from centrifuge_tpu.classify.engine import (_pack_pool_outputs,
                                                _unpack_pool_outputs)
    L, mh = 4, 16
    h_top = np.full((L, mh), -1, np.int32)
    h_bot = np.full((L, mh), -1, np.int32)
    h_off = np.zeros((L, mh), np.int32)
    h_len = np.zeros((L, mh), np.int32)
    nhits = np.zeros(L, np.int32)
    sums = np.zeros(L, np.int32)
    # lane 0: ordinary hit; lane 2: saturating size
    h_top[0, 0], h_bot[0, 0], h_off[0, 0], h_len[0, 0] = 100, 104, 3, 25
    nhits[0] = 1
    h_top[2, 0], h_bot[2, 0], h_off[2, 0], h_len[2, 0] = 7, 7 + 20000, 0, 30
    nhits[2] = 1
    budget = 8
    packed = np.asarray(_pack_pool_outputs(
        jnp.asarray(h_top), jnp.asarray(h_bot), jnp.asarray(h_off),
        jnp.asarray(h_len), jnp.asarray(nhits), jnp.asarray(sums),
        budget, mode=5))
    out = _unpack_pool_outputs(packed, L, mh, budget, mode=5)
    assert out[0][0, 0] == 100 and out[1][0, 0] == 104
    assert out[2][0, 0] == 3 and out[3][0, 0] == 25
    assert out[4][0] == 1
    assert out[4][2] > mh          # poisoned -> overflow re-fetch
    assert out[0][2, 0] == 7       # top still exact


def test_segmented_compaction_parity():
    """search_loop's lockstep-compaction schedule must be bit-identical
    to the plain full-width loop: an early compaction point (survivors
    fit -> compact+merge branch) and an absurdly early one (survivors
    exceed capacity -> the lax.cond keeps full width) both count."""
    import os
    import jax.numpy as jnp
    from centrifuge_tpu.classify.engine import (BatchSearchEngine,
                                                batched_search_packed,
                                                _unpack_search_outputs)
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "synth")
    idx = load_cf_index(os.path.join(fx, "synth"))
    fm = DeviceFMIndex.build(idx)
    reads = read_batch([os.path.join(fx, "reads.fq")])[:48]
    seqs = []
    for r in reads:
        seqs.append(r.seq)
        seqs.append(r.revcomp())
    rng = np.random.default_rng(7)
    # junk + short reads diversify per-lane step counts
    seqs += [rng.integers(0, 4, int(n)).astype(np.uint8)
             for n in rng.integers(36, 150, 100)]

    eng = BatchSearchEngine(fm)
    nlanes = 256
    rseqp, lengths = eng.pack_transport(seqs, 160, nlanes)
    args = (fm.blocks, fm.fchr, fm.ftab_tb,
            jnp.asarray(fm.zoff, fm.row_dtype),
            jnp.asarray(rseqp), jnp.asarray(lengths),
            jnp.asarray(np.zeros(nlanes, np.int32)))
    kw = dict(min_hitlen=22, increment=10, max_hits=16,
              first_hit_only=False, nblk=fm.nblk, compact=0,
              packed_input=True)
    ref = _unpack_search_outputs(
        np.asarray(batched_search_packed(*args, **kw)), 16, 0)
    for segments in (
            ((11, nlanes // 2),),              # normal: survivors fit
            ((1, nlanes // 2),),               # too early: cond overflow
            ((6, nlanes // 2), (6, nlanes // 4)),   # two levels
    ):
        got = _unpack_search_outputs(
            np.asarray(batched_search_packed(*args, segments=segments,
                                             **kw)), 16, 0)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transport2_parity():
    """The 2-bit (4 codes/byte) transport must give identical search
    results to the 4-bit packing on N-free batches, and batches with Ns
    must fall back to tmode=1."""
    import os
    from centrifuge_tpu.classify.engine import BatchSearchEngine
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "synth")
    idx = load_cf_index(os.path.join(fx, "synth"))
    fm = DeviceFMIndex.build(idx)
    reads = [r for r in read_batch([os.path.join(fx, "reads.fq")])
             if not (r.seq > 3).any()][:64]
    seqs = []
    for r in reads:
        seqs.append(r.seq)
        seqs.append(r.revcomp())
    rng = np.random.default_rng(11)
    seqs += [rng.integers(0, 4, int(n)).astype(np.uint8)
             for n in rng.integers(33, 151, 64)]

    eng = BatchSearchEngine(fm)
    m2, l2, t2 = eng.pack_transport2(seqs, 160, 256)
    assert t2 == 2, "N-free batch must take the 2-bit packing"
    # device-side unpack equality against the 4-bit path
    import jax.numpy as jnp
    from centrifuge_tpu.classify.engine import (_unpack_rseq,
                                                _unpack_rseq2)
    m1, l1 = eng.pack_transport(seqs, 160, 256)
    a = np.asarray(_unpack_rseq(jnp.asarray(m1)))
    b = np.asarray(_unpack_rseq2(jnp.asarray(m2)))
    np.testing.assert_array_equal(a[:, :170], b[:, :170])
    np.testing.assert_array_equal(l1, l2)

    # end-to-end: search results identical whichever transport runs
    ref = [np.asarray(x) for x in eng.search(seqs)]
    eng4 = BatchSearchEngine(fm)
    orig = eng4.pack_transport2
    eng4.pack_transport2 = lambda s_, lm, nl: (
        eng4.pack_transport(s_, lm, nl) + (1,))
    got = [np.asarray(x) for x in eng4.search(seqs)]
    for x, y in zip(ref, got):
        np.testing.assert_array_equal(x, y)

    # a batch containing N codes must fall back
    nseqs = [s.copy() for s in seqs[:8]]
    nseqs[3][5] = 4
    _, _, tm = eng.pack_transport2(nseqs, 160, 16)
    assert tm == 1


def test_deep_ftab_prime_byte_parity():
    """The load-time depth-12 ftab (DeviceFMIndex nblk12; two fewer LF
    steps per successful start) must leave classification output
    byte-identical: every reference trajectory failing before depth 12
    has an empty 12-mer range, which falls back to the plain path."""
    import os
    from conftest import fixture_path
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex

    idx = load_cf_index(fixture_path("synth", "synth"))
    reads = read_batch([fixture_path("synth", "reads.fq")], limit=400)
    plain = TPUClassificationPipeline(idx)
    rows_plain = plain.classify_batch_unpaired(reads)
    dfm = DeviceFMIndex.build(idx, keep_host_blocks=True, deep_ftab=True)
    assert dfm.nblk12 > 0, "deep ftab must build"
    deep = TPUClassificationPipeline(idx, dfm=dfm)
    rows_deep = deep.classify_batch_unpaired(reads)
    assert rows_plain == rows_deep
    golden = open(os.path.join(fixture_path("synth"),
                               "golden_output.tsv")).read().splitlines()
    assert rows_deep == golden[1: len(rows_deep) + 1]


def test_ftab12_device_matches_native_host():
    """The device-computed depth-12 ftab region (_ftab12_rows_graph,
    the default) must be bit-identical to the native host oracle
    (fmwalk.cpp fm_ftab_extend) -- same guarded-LF semantics, same
    packed block-row layout, both directions of the
    CENTRIFUGE_TPU_DEEP_FTAB_DEVICE toggle."""
    import numpy as np
    from conftest import fixture_path
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.native.fmwalk import ftab_extend
    from centrifuge_tpu.ops.fm_jax import (DeviceFMIndex, pack_bwt_blocks,
                                           pack_ftab_rows)

    idx = load_cf_index(fixture_path("synth", "synth"))
    dfm = DeviceFMIndex.build(idx, deep_ftab=True)   # device path default
    assert dfm.nblk12 > 0
    ufm = np.asarray(dfm.ufm)
    got = ufm[dfm.nblk12:]

    rows = pack_bwt_blocks(idx.bwt, wide=False)
    ft12 = ftab_extend(rows, idx, wide=False)
    assert ft12 is not None, "native library must be present for the oracle"
    want = pack_ftab_rows(ft12[0], ft12[1], False, ufm.shape[1])
    np.testing.assert_array_equal(got, want)
