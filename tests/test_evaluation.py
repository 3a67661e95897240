"""Simulation + accuracy evaluation harness (evaluation/ equivalents)."""

import os

from conftest import fixture_path


def test_simulate_and_evaluate(tmp_path):
    from centrifuge_tpu.evaluation.simulate import SimConfig, simulate
    from centrifuge_tpu.evaluation.evaluate import (evaluate_classification,
                                                    parse_truth)
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.io.fastx import read_batch

    fx = fixture_path("synth")
    prefix = str(tmp_path / "sim")
    simulate(os.path.join(fx, "db.fa"), os.path.join(fx, "conv.dmp"),
             prefix, SimConfig(num_fragments=300, error_rate=0.005, seed=7))
    assert os.path.exists(prefix + ".fq")
    assert os.path.exists(prefix + ".truth")

    idx = load_cf_index(os.path.join(fx, "synth"))
    reads = read_batch([prefix + ".fq"])
    assert len(reads) > 200
    pipe = TPUClassificationPipeline(idx)
    rows = [pipe.formatter.header()] + pipe.classify_batch_unpaired(reads)

    res = evaluate_classification(idx.taxonomy, rows, {})
    assert res.reads > 200
    # ~25% of each synth genome is a genus-shared core, so those reads
    # legitimately promote to genus (multi-species LCA); species-level
    # accuracy therefore tops out near 0.75 on this fixture
    assert res.species.accuracy > 0.6, res.species
    assert res.genus.accuracy > 0.95, res.genus


def test_compare_abundance():
    from centrifuge_tpu.evaluation.evaluate import compare_abundance
    ssr = compare_abundance({1: 0.5, 2: 0.5}, {1: 0.4, 2: 0.6})
    assert abs(ssr - 0.02) < 1e-12


def test_sql_logging(tmp_path, synth_index):
    """sqlite result logging with the reference's Classification table
    schema (centrifuge_evaluate.py:180-230, incl. its column-name typo)."""
    import sqlite3
    from centrifuge_tpu.evaluation.evaluate import (EvalResult,
                                                    log_result_sql)
    res = EvalResult()
    res.reads = 10
    res.strain.correct = 7
    res.species.correct = 9
    db = tmp_path / "eval.db"
    log_result_sql(str(db), "synth", "reads", "single", res, 1.5,
                   cmd="test-cmd")
    con = sqlite3.connect(str(db))
    cols = [r[1] for r in con.execute("PRAGMA table_info(Classification)")]
    assert "centrifutgeIndex" in cols      # reference's exact (typo'd) name
    assert "phylum_unclassified" in cols
    row = list(con.execute(
        "SELECT strain_classified, species_classified, numFragments, cmd "
        "FROM Classification"))[0]
    assert row == (7, 9, 10, "test-cmd")
    # second insert appends
    log_result_sql(str(db), "synth", "reads", "single", res, 1.5, cmd="c2")
    assert len(list(con.execute("SELECT id FROM Classification"))) == 2
