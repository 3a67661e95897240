"""HLL++ sketch accuracy + kmer plumbing."""

import numpy as np

from centrifuge_tpu.report.hll import (HyperLogLogPlus, kmers_of,
                                       murmur3_finalizer)


def test_sparse_exact():
    h = HyperLogLogPlus()
    items = np.arange(1000, dtype=np.uint64)
    h.add(items)
    assert h.cardinality() == 1000
    h.add(items)  # duplicates do not change the count
    assert h.cardinality() == 1000


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
