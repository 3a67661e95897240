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
