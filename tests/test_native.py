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


class _NullMetWriter:
    def emit(self, *a, **k):
        pass

    def close(self, *a, **k):
        pass


@pytest.mark.parametrize("k", [1, 5, 20])
def test_flat_rows_match_preselected_path(synth_index, synth_reads, k):
    """The all-native row path (process_rows: C++ formatting + species
    metrics) must be byte-identical to the AlnResult/formatter path."""
    pn, _ = _pipelines(synth_index, khits=k)
    assert pn._flat_eligible()
    rows_flat = pn.classify_batch_unpaired(synth_reads[:600])
    po, _ = _pipelines(synth_index, khits=k)
    po.met_read = _NullMetWriter()  # forces the AlnResult emit path
    assert not po._flat_eligible()
    rows_old = po.classify_batch_unpaired(synth_reads[:600])
    assert rows_flat == rows_old
    assert pn.spm.species_counts == po.spm.species_counts
    assert pn.spm.observed == po.spm.observed
    assert pn.spm.cur_ids == po.spm.cur_ids


def test_flat_paired_rows_match(synth_index):
    from centrifuge_tpu.io.fastx import read_batch
    pairs = list(zip(read_batch([fixture_path("synth", "reads_1.fq")]),
                     read_batch([fixture_path("synth", "reads_2.fq")])))
    pn, _ = _pipelines(synth_index, khits=5)
    rows_flat = pn.classify_batch_paired(pairs)
    po, _ = _pipelines(synth_index, khits=5)
    po.met_read = _NullMetWriter()
    rows_old = po.classify_batch_paired(pairs)
    assert rows_flat == rows_old
    assert pn.spm.observed == po.spm.observed


def test_flat_path_switch_carries_cur_ids(synth_index, synth_reads):
    """Switching between the Python emit path and the native flat path
    mid-stream must preserve the cur_ids carry-over quirk (the native
    state is seeded on entry and drained on spm access)."""
    k = 20  # multi-assignment workload: cur_ids stays non-empty between reads
    pn, pp = _pipelines(synth_index, khits=k)
    half = synth_reads[:300], synth_reads[300:600]
    pn.met_read = _NullMetWriter()      # first half: AlnResult path
    rows = pn.classify_batch_unpaired(half[0])
    pn.met_read = None                  # second half: flat native path
    assert pn._flat_eligible()
    rows += pn.classify_batch_unpaired(half[1])
    rows_ref = pp.classify_batch_unpaired(half[0])
    rows_ref += pp.classify_batch_unpaired(half[1])
    assert rows == rows_ref
    assert pn.spm.species_counts == pp.spm.species_counts
    assert pn.spm.observed == pp.spm.observed
    assert pn.spm.cur_ids == pp.spm.cur_ids


def test_native_no_traverse_and_rank(synth_index, synth_reads):
    pn, pp = _pipelines(synth_index, tree_traverse=False)
    assert pn.classify_batch_unpaired(synth_reads[:400]) == \
        pp.classify_batch_unpaired(synth_reads[:400])
    pn, pp = _pipelines(synth_index, classification_rank="genus")
    assert pn.classify_batch_unpaired(synth_reads[:400]) == \
        pp.classify_batch_unpaired(synth_reads[:400])


@pytest.mark.parametrize("wide", [False, True])
def test_host_resolver_matches_device(synth_index, wide):
    """native/fmwalk.cpp host LF walk == ops/fm_jax device resolver."""
    from centrifuge_tpu.native.fmwalk import HostResolver
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex, make_resolver
    dfm = DeviceFMIndex.build(synth_index, wide=wide, keep_host_blocks=True)
    dev = make_resolver(dfm)
    host = HostResolver(dfm.host_blocks, synth_index, wide)
    rng = np.random.default_rng(7)
    rows = rng.integers(0, synth_index.bwt_len, 8192, dtype=np.int64)
    # edge rows: start of table, the '$' row, boundary rows, last row
    extra = np.concatenate([
        np.array([0, synth_index.zoff, synth_index.bwt_len - 1], np.int64),
        synth_index.boundary_rows[:32].astype(np.int64)])
    rows = np.concatenate([rows, extra])
    rdt = np.int64 if wide else np.int32
    want = np.asarray(dev(rows.astype(rdt)))
    got = host(rows)
    np.testing.assert_array_equal(want, got)


def test_host_resolver_ignores_padded_block_rows(tmp_path):
    """Sharded callers hand HostResolver fm-axis _pad_to'd block rows
    (parallel/sharded.py ShardedFMArrays.build); fmwalk.cpp's count-down
    rank must not treat a zero pad row as the next occ checkpoint. Needs
    an index with bwt_len % 512 >= 258 (rows in the back half of a
    partial last block) -- the synth fixture has bwt_len % 512 == 1 and
    cannot catch this."""
    import os
    from centrifuge_tpu.build.builder import build_index
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.native.fmwalk import HostResolver
    from centrifuge_tpu.ops.fm_jax import pack_bwt_blocks
    from centrifuge_tpu.parallel.sharded import _pad_to

    rng = np.random.default_rng(11)
    # several sequences: with one sequence every row resolves to tidx 0
    # and a corrupted walk is invisible
    nseq, seqlen = 8, 293
    fa = tmp_path / "t.fa"
    fa.write_text("".join(
        f">t{i}\n" + "".join(rng.choice(list("ACGT"), seqlen)) + "\n"
        for i in range(nseq)))
    (tmp_path / "conv.dmp").write_text("".join(
        f"t{i}\t{1000+i}\n" for i in range(nseq)))
    (tmp_path / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n" + "".join(
            f"{1000+i}\t|\t1\t|\tspecies\t|\n" for i in range(nseq)))
    (tmp_path / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n" + "".join(
            f"{1000+i}\t|\tT{i}\t|\t\t|\tscientific name\t|\n"
            for i in range(nseq)))
    base = str(tmp_path / "idx")
    build_index([str(fa)], base, str(tmp_path / "conv.dmp"),
                str(tmp_path / "nodes.dmp"), str(tmp_path / "names.dmp"))
    idx = load_cf_index(base)
    assert idx.bwt_len % 512 >= 258, idx.bwt_len

    rows_np = pack_bwt_blocks(idx.bwt, False)
    padded = _pad_to(rows_np, 8)
    assert padded.shape[0] > rows_np.shape[0]
    plain = HostResolver(rows_np, idx, False)
    shard = HostResolver(padded, idx, False)
    rows = np.arange(idx.bwt_len, dtype=np.int64)
    np.testing.assert_array_equal(plain(rows), shard(rows))


def test_host_resolve_pipeline_matches_presolve(synth_index, synth_reads):
    """Full native pipeline with host_resolve on vs off: identical rows."""
    from centrifuge_tpu.classify.pipeline import PipelineConfig
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    ph = TPUClassificationPipeline(synth_index,
                                   PipelineConfig(host_resolve=True))
    pd = TPUClassificationPipeline(synth_index,
                                   PipelineConfig(host_resolve=False))
    assert not ph.presolve and pd.presolve
    from centrifuge_tpu.native.fmwalk import HostResolver
    assert isinstance(ph.resolver, HostResolver)
    rows_h = ph.classify_batch_unpaired(synth_reads[:600])
    rows_d = pd.classify_batch_unpaired(synth_reads[:600])
    assert rows_h == rows_d


def test_native_pack_transport_matches_numpy():
    """native/pack.cpp must produce the exact transport bytes the numpy
    pack+transport pair produces (incl. N codes, odd lengths, padding
    lanes)."""
    import numpy as np
    from centrifuge_tpu.classify.engine import BatchSearchEngine
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex
    from conftest import fixture_path
    idx = load_cf_index(fixture_path("synth", "synth"))
    eng = BatchSearchEngine(DeviceFMIndex.build(idx))
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 5, int(rng.integers(1, 300))).astype(np.uint8)
            for _ in range(777)]
    ref = eng.transport(eng.pack(seqs, 512, 1024)[0])
    got, lens = eng.pack_transport(seqs, 512, 1024)
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(
        lens[:777], np.array([len(s) for s in seqs], np.int32))


def test_broken_native_lib_warns_loudly(monkeypatch, capsys):
    """A native extension that fails to build must (a) fall back to the
    Python path, (b) print ONE stderr warning, and (c) show up in
    utils.fallback.fallbacks() so bench.py can flag it."""
    import centrifuge_tpu.native.pack as pack
    import centrifuge_tpu.utils.fallback as fb

    monkeypatch.setattr(pack, "_LIB", None)
    monkeypatch.setattr(pack, "_LIB_FAILED", False)
    monkeypatch.setattr(fb, "_WARNED", {})

    def boom(*a, **k):
        raise RuntimeError("deliberately broken toolchain")
    import centrifuge_tpu.native.compile as comp
    monkeypatch.setattr(comp, "build_native", boom)

    assert pack._load() is None           # fell back
    assert pack._load() is None           # second call: cached failure
    err = capsys.readouterr().err
    assert err.count("pack.cpp") == 1     # warned exactly once
    assert "falling back" in err
    flagged = fb.fallbacks()
    assert any("pack.cpp" in k for k in flagged)
    assert "deliberately broken" in next(iter(flagged.values()))


def test_host_first_hits_matches_device(synth_index):
    """fmwalk.fm_first_hits (host extension search) must agree with the
    device search_first_hits lane for lane: same hit ranges, same empty
    hits for N windows / short tails / dead ranges, same lengths."""
    import numpy as np
    from centrifuge_tpu.classify.engine import BatchSearchEngine
    from centrifuge_tpu.native.fmwalk import HostResolver
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex

    dfm = DeviceFMIndex.build(synth_index, keep_host_blocks=True)
    eng = BatchSearchEngine(dfm)
    hr = HostResolver(dfm.host_blocks, synth_index, dfm.wide)

    rng = np.random.default_rng(7)
    seqs, offs = [], []
    for i in range(300):
        ln = int(rng.integers(16, 200))
        s = rng.integers(0, 4, ln).astype(np.uint8)
        if i % 4 == 0:   # sprinkle N runs (code 4)
            p = int(rng.integers(0, ln))
            s[p: p + int(rng.integers(1, 12))] = 4
        seqs.append(s)
        offs.append(int(rng.integers(0, ln)))
    offs = np.array(offs, np.int32)

    dv = eng.search_first_hits(seqs, offs)
    hv = hr.first_hits(seqs, offs)
    for i in range(len(seqs)):
        dt, db = int(dv[0][i, 0]), int(dv[1][i, 0])
        ht, hb = int(hv[0][i, 0]), int(hv[1][i, 0])
        assert (dt < 0) == (ht < 0), (i, dt, ht)
        if dt >= 0:
            assert (dt, db) == (ht, hb), (i, dt, db, ht, hb)
        assert int(dv[2][i, 0]) == int(hv[2][i, 0]), i   # offset
        assert int(dv[3][i, 0]) == int(hv[3][i, 0]), i   # length
