"""Index loader invariants + exact text reconstruction."""

import numpy as np

from centrifuge_tpu.ops.fm_numpy import FMOracle
from conftest import fixture_path


def load_fasta_joined(path):
    seqs, cur = [], []
    for line in open(path):
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
                cur = []
        else:
            cur.append(line.strip())
    seqs.append("".join(cur))
    lut = np.zeros(256, np.uint8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    return np.concatenate(
        [lut[np.frombuffer(s.encode(), np.uint8)] for s in seqs])


def test_example_header(example_index):
    idx = example_index
    assert idx.length == 1073
    assert idx.npat == 2
    assert idx.ftab_chars == 10
    assert idx.offrate == 4
    assert list(idx.plen) == [556, 517]
    assert idx.uid_to_tid == [("gi|4", 9646), ("gi|7", 9913)]
    assert int(idx.fchr[4]) == idx.length
    # char counts must match fchr deltas
    cnt = np.bincount(idx.bwt, minlength=4).astype(np.int64)
    cnt[0] -= 1  # '$' stored as code 0
    assert np.array_equal(cnt[:4], np.diff(idx.fchr.astype(np.int64)))


def test_example_text_restore(example_index):
    orc = FMOracle(example_index)
    txt = orc.restore_text()
    want = load_fasta_joined(fixture_path("example", "test.fa"))
    assert np.array_equal(txt, want)


def test_example_taxonomy(example_index):
    tax = example_index.taxonomy
    assert tax.tree[9913].rank != 0
    assert 9646 in tax.names
    # path table: species slot holds the species id
    path = tax.get_path(9913)
    assert path[1] == 9913 or path[0] == 9913


def test_boundaries_loaded(synth_index):
    assert synth_index.boundary_rows.shape[0] == synth_index.npat
    assert np.all(np.diff(synth_index.boundary_rows.astype(np.int64)) > 0)
