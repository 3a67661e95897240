"""Golden-file byte-parity tests vs C++ centrifuge outputs.

The fixtures under tests/fixtures were produced by the reference
implementation (built in a scratch tree, not part of this repo) on the
bundled example data and a deterministic synthetic database
(tests/fixtures/make_synth.py).
"""

import pytest

from centrifuge_tpu.ops.fm_numpy import FMOracle
from centrifuge_tpu.io.fastx import read_fastx
from centrifuge_tpu.classify.pipeline import ClassificationPipeline, PipelineConfig
from centrifuge_tpu.classify.algo import ClassifierConfig
from centrifuge_tpu.report.writers import kreport_lines, write_report
from conftest import fixture_path


def run_unpaired(idx, reads_path, cfg=None):
    pipe = ClassificationPipeline(idx, FMOracle(idx), cfg)
    rows = [pipe.formatter.header()]
    for rec in read_fastx(reads_path):
        rows.extend(pipe.classify_unpaired(rec))
    return "\n".join(rows) + "\n", pipe.spm


def golden(*parts):
    with open(fixture_path(*parts)) as f:
        return f.read()


def test_example_output(example_index):
    got, _ = run_unpaired(example_index, fixture_path("example", "reads.fa"))
    assert got == golden("example", "golden_output.tsv")


def test_example_kreport(example_index):
    got, _ = run_unpaired(example_index, fixture_path("example", "reads.fa"))
    lines = kreport_lines(example_index, got.splitlines())
    assert "\n".join(lines) + "\n" == golden("example", "golden_kreport.txt")


@pytest.fixture(scope="module")
def synth_run(synth_index):
    return run_unpaired(synth_index, fixture_path("synth", "reads.fa"))


def test_synth_output(synth_run):
    got, _ = synth_run
    assert got == golden("synth", "golden_output.tsv")


def test_synth_report(synth_index, synth_run, tmp_path):
    _, spm = synth_run
    out = tmp_path / "report.tsv"
    write_report(str(out), synth_index, spm)
    assert out.read_text() == golden("synth", "golden_report.tsv")


def test_synth_kreport(synth_index, synth_run):
    got, _ = synth_run
    lines = kreport_lines(synth_index, got.splitlines())
    assert "\n".join(lines) + "\n" == golden("synth", "golden_kreport.txt")


@pytest.mark.parametrize("k,fname", [(1, "golden_k1.tsv"), (20, "golden_k20.tsv")])
def test_synth_k_variants(synth_index, k, fname):
    cfg = PipelineConfig(classifier=ClassifierConfig(khits=k))
    got, _ = run_unpaired(synth_index, fixture_path("synth", "reads.fa"), cfg)
    assert got == golden("synth", fname)


def test_synth_paired(synth_index, tmp_path):
    pipe = ClassificationPipeline(synth_index, FMOracle(synth_index))
    rows = [pipe.formatter.header()]
    for a, b in zip(read_fastx(fixture_path("synth", "reads_1.fq")),
                    read_fastx(fixture_path("synth", "reads_2.fq"))):
        rows.extend(pipe.classify_paired(a, b))
    got = "\n".join(rows) + "\n"
    assert got == golden("synth", "golden_paired.tsv")
    out = tmp_path / "report.tsv"
    write_report(str(out), synth_index, pipe.spm)
    assert out.read_text() == golden("synth", "golden_paired_report.tsv")


def test_threaded_stream_parity(synth_index):
    """threaded_stream=True (tail-thread overlap, the default) produces
    identical rows AND identical species-metrics state to the
    single-threaded stream: tails run FIFO on one worker, so the native
    spm accumulation order is unchanged."""
    from centrifuge_tpu.classify.pipeline import PipelineConfig
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.io.fastx import read_batch
    from conftest import fixture_path

    reads = read_batch([fixture_path("synth", "reads.fq")], limit=512)
    batches = [reads[i: i + 128] for i in range(0, len(reads), 128)]

    base = TPUClassificationPipeline(
        synth_index, PipelineConfig(threaded_stream=False))
    want = [r for chunk in base.classify_stream_unpaired(iter(batches))
            for r in chunk]

    cfg = PipelineConfig(threaded_stream=True)
    pipe = TPUClassificationPipeline(synth_index, cfg)
    assert pipe.native is not None
    got = [r for chunk in pipe.classify_stream_unpaired(iter(batches))
           for r in chunk]
    assert got == want
    assert pipe.spm.species_counts == base.spm.species_counts
    assert pipe.spm.observed == base.spm.observed


def test_threaded_stream_parity_paired(synth_index):
    """Paired tail-thread overlap matches the single-threaded paired
    stream byte for byte."""
    from centrifuge_tpu.classify.pipeline import PipelineConfig
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.io.fastx import read_batch
    from conftest import fixture_path

    m1 = read_batch([fixture_path("synth", "reads_1.fq")], limit=384)
    m2 = read_batch([fixture_path("synth", "reads_2.fq")], limit=384)
    pairs = list(zip(m1, m2))
    batches = [pairs[i: i + 96] for i in range(0, len(pairs), 96)]

    base = TPUClassificationPipeline(
        synth_index, PipelineConfig(threaded_stream=False))
    want = [r for chunk in base.classify_stream_paired(iter(batches))
            for r in chunk]

    pipe = TPUClassificationPipeline(
        synth_index, PipelineConfig(threaded_stream=True))
    assert pipe.native is not None
    got = [r for chunk in pipe.classify_stream_paired(iter(batches))
           for r in chunk]
    assert got == want
    assert pipe.spm.species_counts == base.spm.species_counts
