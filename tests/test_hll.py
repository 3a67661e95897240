"""HLL++ sketch accuracy + kmer plumbing."""

import numpy as np

from centrifuge_tpu.report.hll import (HyperLogLogPlus, kmers_of,
                                       murmur3_finalizer)


def test_sparse_near_exact():
    h = HyperLogLogPlus()
    items = np.arange(1000, dtype=np.uint64)
    h.add(items)
    # sparse linear counting over the 2^24 encoding space: within 1
    # of exact (the reference truncates the double estimate)
    assert abs(h.cardinality() - 1000) <= 1
    before = h.cardinality()
    h.add(items)  # duplicates do not change the count
    assert h.cardinality() == before


def _ranhash(u: np.ndarray) -> np.ndarray:
    """Numerical Recipes ranhash (hyperloglogplus.h:60-70), vectorized;
    the golden generator (tests/tools/gen_hll_golden.cpp) feeds the
    sketch with this stream."""
    with np.errstate(over="ignore"):
        v = u.astype(np.uint64) * np.uint64(3935559000370003845) \
            + np.uint64(2691343689449507681)
        v ^= v >> np.uint64(21)
        v ^= v << np.uint64(37)
        v ^= v >> np.uint64(4)
        v *= np.uint64(4768777513237032717)
        v ^= v << np.uint64(20)
        v ^= v >> np.uint64(41)
        v ^= v << np.uint64(5)
    return v


def test_reference_bit_exact():
    """Estimates equal the reference C++ header's, value for value
    (tests/fixtures/hll_golden.json from tests/tools/gen_hll_golden.cpp)."""
    import json
    from conftest import fixture_path
    golden = json.load(open(fixture_path("hll_golden.json")))
    for key, want in golden.items():
        if key.startswith("merge"):
            continue
        n = int(key)
        h = HyperLogLogPlus(10)
        items = _ranhash(np.arange(n, dtype=np.uint64))
        # generator adds every item once, every 3rd item twice
        h.add(items)
        h.add(items[::3])
        assert h.cardinality() == want, (n, h.cardinality(), want)

    a, b = HyperLogLogPlus(10), HyperLogLogPlus(10)
    a.add(_ranhash(np.arange(0, 700, dtype=np.uint64)))
    b.add(_ranhash(np.arange(500, 1300, dtype=np.uint64)))
    a.merge(b)
    assert a.cardinality() == golden["merge_700_1300"]

    a, b = HyperLogLogPlus(10), HyperLogLogPlus(10)
    a.add(_ranhash(np.arange(0, 30000, dtype=np.uint64)))
    b.add(_ranhash(np.arange(20000, 20500, dtype=np.uint64)))
    a.merge(b)
    assert a.cardinality() == golden["merge_dense_sparse"]


def test_dense_estimate_within_tolerance():
    rng = np.random.default_rng(0)
    for true_n in (20_000, 200_000):
        h = HyperLogLogPlus()
        items = rng.integers(0, 1 << 62, true_n, dtype=np.uint64)
        h.add(items)
        est = h.cardinality()
        # p=10 -> standard error ~1.04/sqrt(1024) ~ 3.3%; allow 4 sigma
        assert abs(est - true_n) / true_n < 0.13, (true_n, est)


def test_merge():
    a, b = HyperLogLogPlus(), HyperLogLogPlus()
    a.add(np.arange(0, 30000, dtype=np.uint64))
    b.add(np.arange(15000, 45000, dtype=np.uint64))
    a.merge(b)
    est = a.cardinality()
    assert abs(est - 45000) / 45000 < 0.13


def test_finalizer_nonzero_and_deterministic():
    h1 = murmur3_finalizer(np.array([0, 1, 2], dtype=np.uint64))
    h2 = murmur3_finalizer(np.array([0, 1, 2], dtype=np.uint64))
    assert (h1 == h2).all()
    assert (h1 != 0).all()


def test_kmers_of():
    seq = np.array([0, 1, 2, 3, 0], dtype=np.uint8)
    ks = kmers_of(seq, k=4)
    assert ks.shape[0] == 2
    assert ks[0] == (0 << 6) | (1 << 4) | (2 << 2) | 3
    assert ks[1] == (1 << 6) | (2 << 4) | (3 << 2) | 0
    short = kmers_of(np.array([1, 2], dtype=np.uint8), k=4)
    assert short.shape[0] == 1 and short[0] == (1 << 2) | 2


def test_pipeline_kmer_counting():
    """count_kmers plumbs unique-read kmers into SpeciesMetrics."""
    import os
    from conftest import fixture_path
    from centrifuge_tpu.classify.pipeline import PipelineConfig
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch

    idx = load_cf_index(fixture_path("synth", "synth"))
    reads = read_batch([fixture_path("synth", "reads.fq")], limit=50)
    cfg = PipelineConfig(count_kmers=True)
    pipe = TPUClassificationPipeline(idx, cfg)
    pipe.classify_batch_unpaired(reads)
    assert pipe.spm.species_kmers, "unique reads must produce sketches"
    total = sum(pipe.spm.n_distinct_kmers(t) for t in pipe.spm.species_kmers)
    assert total > 100
