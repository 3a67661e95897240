"""Native C++ assignment engine: must match the Python path bit-for-bit."""

import numpy as np
import pytest

from conftest import fixture_path


@pytest.fixture(scope="module")
def synth_reads():
    from centrifuge_tpu.io.fastx import read_batch
    return read_batch([fixture_path("synth", "reads.fq")])


def _pipelines(idx, **cls_kwargs):
    from centrifuge_tpu.classify.algo import ClassifierConfig
    from centrifuge_tpu.classify.pipeline import PipelineConfig
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    cn = PipelineConfig(classifier=ClassifierConfig(**cls_kwargs),
                        use_native=True)
    cp = PipelineConfig(classifier=ClassifierConfig(**cls_kwargs),
                        use_native=False)
    pn = TPUClassificationPipeline(idx, cn)
    assert pn.native is not None, "native engine must build in this image"
    return pn, TPUClassificationPipeline(idx, cp)


def test_native_builds_and_matches_python(synth_index, synth_reads):
    pn, pp = _pipelines(synth_index)
    rn = pn.classify_batch_unpaired(synth_reads)
    rp = pp.classify_batch_unpaired(synth_reads)
    assert rn == rp
    # metrics state (feeds report/kreport) must match too
    assert pn.spm.species_counts == pp.spm.species_counts
    assert pn.spm.observed == pp.spm.observed


@pytest.mark.parametrize("k", [1, 20])
def test_native_khits_variants(synth_index, synth_reads, k):
    pn, pp = _pipelines(synth_index, khits=k)
    assert pn.classify_batch_unpaired(synth_reads[:500]) == \
        pp.classify_batch_unpaired(synth_reads[:500])


def test_native_paired(synth_index):
    from centrifuge_tpu.io.fastx import read_batch
    pairs = list(zip(read_batch([fixture_path("synth", "reads_1.fq")]),
                     read_batch([fixture_path("synth", "reads_2.fq")])))
    pn, pp = _pipelines(synth_index)
    assert pn.classify_batch_paired(pairs) == pp.classify_batch_paired(pairs)


def test_native_host_exclude_taxids(synth_index, synth_reads):
    pn, pp = _pipelines(synth_index, host_taxids=(100,))
    assert pn.classify_batch_unpaired(synth_reads[:400]) == \
        pp.classify_batch_unpaired(synth_reads[:400])
    pn, pp = _pipelines(synth_index, exclude_taxids=(1000, 1001))
    assert pn.classify_batch_unpaired(synth_reads[:400]) == \
        pp.classify_batch_unpaired(synth_reads[:400])


def test_native_no_traverse_and_rank(synth_index, synth_reads):
    pn, pp = _pipelines(synth_index, tree_traverse=False)
    assert pn.classify_batch_unpaired(synth_reads[:400]) == \
        pp.classify_batch_unpaired(synth_reads[:400])
    pn, pp = _pipelines(synth_index, classification_rank="genus")
    assert pn.classify_batch_unpaired(synth_reads[:400]) == \
        pp.classify_batch_unpaired(synth_reads[:400])
