"""Index builder parity: rebuild the fixture indexes byte-for-byte.

The fixtures' .cf files were produced by the reference centrifuge-build
binary; our builder (FASTA scan -> native SA-IS -> vectorized BWT/ftab
emission) must reproduce every byte, including the ftab/eftab absorb
encoding, the +11bp SA-sample attribution, and the .4.cf boundary map.
"""

import filecmp
import os

import numpy as np
import pytest

from centrifuge_tpu.build.builder import build_index
from centrifuge_tpu.build.ref_read import get_tid, get_uid, scan_fastas
from centrifuge_tpu.build.sa import (suffix_array, suffix_array_doubling)

from conftest import fixture_path


@pytest.mark.parametrize("fixture,fasta,conv", [
    ("synth", "db.fa", "conv.dmp"),
    ("example", "test.fa", "gi_to_tid.dmp"),
])
def test_build_byte_parity(tmp_path, fixture, fasta, conv):
    fx = fixture_path(fixture)
    base = str(tmp_path / "idx")
    name = "synth" if fixture == "synth" else "test"
    build_index([os.path.join(fx, fasta)], base,
                os.path.join(fx, conv), os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"))
    for ext in ("1", "2", "3", "4"):
        ours = f"{base}.{ext}.cf"
        ref = os.path.join(fx, f"{name}.{ext}.cf")
        assert filecmp.cmp(ours, ref, shallow=False), f".{ext}.cf differs"


def test_sa_native_matches_doubling():
    rng = np.random.default_rng(123)
    for _ in range(10):
        n = int(rng.integers(1, 4000))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        np.testing.assert_array_equal(
            suffix_array(codes), suffix_array_doubling(codes))
    # degenerate repetitive texts stress SA-IS recursion
    for codes in (np.zeros(500, np.uint8),
                  np.tile([0, 1], 300).astype(np.uint8),
                  np.tile([3, 2, 3], 101).astype(np.uint8)):
        np.testing.assert_array_equal(
            suffix_array(codes), suffix_array_doubling(codes))


def test_uid_tid_parsing():
    assert get_uid("seq0 synthetic genome") == "seq0"
    assert get_uid("gi|4|emb|X17276.1| Giant Panda") == "gi|4"
    assert get_uid("plain") == "plain"
    assert get_tid("1234") == 1234
    assert get_tid("12.7") == 12 | (7 << 32)


def test_scan_fasta_gaps(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">s1 one\nACGTNNNNACGT\n>s2 two\nNNACGT\n>s3\nACGTNN\n")
    codes, szs, refnames, plen = scan_fastas([str(fa)])
    assert refnames == ["s1 one", "s2 two", "s3"]
    assert plen == [12, 6, 6]
    recs = [(r.off, r.length, r.first) for r in szs]
    assert recs == [(0, 4, True), (4, 4, False),   # s1: gap splits
                    (2, 4, True),                  # s2: leading Ns
                    (0, 4, True)]                  # s3: trailing Ns dropped
    assert codes.shape[0] == 16


def test_built_index_classifies(tmp_path):
    """End-to-end: build an index from scratch and classify against it."""
    from centrifuge_tpu.index.cf_io import load_cf_index
    from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
    from centrifuge_tpu.io.fastx import read_batch

    fx = fixture_path("synth")
    base = str(tmp_path / "rebuilt")
    build_index([os.path.join(fx, "db.fa")], base,
                os.path.join(fx, "conv.dmp"), os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"))
    idx = load_cf_index(base)
    reads = read_batch([os.path.join(fx, "reads.fq")], limit=100)
    pipe = TPUClassificationPipeline(idx)
    rows = [pipe.formatter.header()] + pipe.classify_batch_unpaired(reads)
    golden = open(os.path.join(fx, "golden_output.tsv")).read().splitlines()
    assert rows == golden[: len(rows)]


@pytest.mark.parametrize("bmax,dcv", [(100000, 1024), (23000, 256), (3200, 256)])
def test_blockwise_build_byte_parity(tmp_path, bmax, dcv):
    """The bounded-memory blockwise builder (difference-cover sample +
    rank-quantile buckets + streaming emission, build/blocksa.cpp +
    build/blockwise.py) must reproduce the reference-built fixture index
    byte-for-byte, across block sizes that force many blocks."""
    fx = fixture_path("synth")
    base = str(tmp_path / "idx")
    build_index([os.path.join(fx, "db.fa")], base,
                os.path.join(fx, "conv.dmp"), os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"), bmax=bmax, dcv=dcv,
                blockwise=True)
    for ext in ("1", "2", "3", "4"):
        ours = f"{base}.{ext}.cf"
        ref = os.path.join(fx, f"synth.{ext}.cf")
        assert filecmp.cmp(ours, ref, shallow=False), f".{ext}.cf differs"


def test_packed_codes_scan_roundtrip(tmp_path):
    """packed=True scanning (0.25 B/base, the nt-scale memory path)
    yields byte-identical codes to the uint8 scan, and PackedCodes
    fancy indexing / unpack match the plain array."""
    from centrifuge_tpu.build.ref_read import PackedCodes
    fx = fixture_path("synth")
    paths = [os.path.join(fx, "db.fa")]
    codes, szs, refnames, plen = scan_fastas(paths)
    pcodes, szs2, refnames2, plen2 = scan_fastas(paths, packed=True)
    assert isinstance(pcodes, PackedCodes)
    assert (szs, refnames, plen) == (szs2, refnames2, plen2)
    assert pcodes.shape == codes.shape
    assert np.array_equal(pcodes.unpack(), codes)
    rng = np.random.default_rng(7)
    idx = rng.integers(0, codes.shape[0], size=4096)
    assert np.array_equal(pcodes[idx], codes[idx])
    # odd-length appends exercise the 2-bit carry path
    from centrifuge_tpu.build.ref_read import PackedCodesBuilder
    b = PackedCodesBuilder()
    pos = 0
    for step in (1, 2, 3, 5, 7, 11, 4096, 333):
        b.append(codes[pos: pos + step])
        pos += step
    b.append(codes[pos:])
    assert np.array_equal(b.finish().unpack(), codes)


def test_blockwise_sa_matches_sais():
    """Blockwise SA order == SA-IS order, including the end-larger
    convention, on repetitive texts."""
    from centrifuge_tpu.build.blockwise import BlockwiseSA
    rng = np.random.default_rng(7)
    for n, bmax, dcv in ((4000, 500, 64), (30000, 2500, 256)):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        codes[n // 3: n // 3 + n // 5] = codes[: n // 5]  # long repeat
        want = suffix_array(codes)
        bsa = BlockwiseSA(codes, bmax=bmax, dcv=dcv)
        # blocks() yields views of one reused buffer: copy to retain
        got = np.concatenate([b.copy() for b in bsa.blocks()])
        bsa.close()
        np.testing.assert_array_equal(got, want)


def test_streaming_writer_native_matches_python(tmp_path):
    """The native per-block emitter (build/emit.cpp) and the numpy feed
    (the oracle) must produce byte-identical .1/.2/.4.cf files."""
    from centrifuge_tpu.build.blockwise import (BlockwiseSA,
                                                StreamingIndexWriter)
    from centrifuge_tpu.build.ref_read import PackedCodes
    fx = fixture_path("synth")
    codes, szs, refnames, plen = scan_fastas([os.path.join(fx, "db.fa")])
    pcodes = PackedCodes.from_codes(codes)
    conv = os.path.join(fx, "conv.dmp")
    nodes = os.path.join(fx, "nodes.dmp")
    names = os.path.join(fx, "names.dmp")
    outs = []
    for tag, native in (("nat", True), ("py", False)):
        base = str(tmp_path / tag)
        bsa = BlockwiseSA(pcodes, bmax=60000, dcv=512)
        w = StreamingIndexWriter(base, pcodes, szs, refnames, plen,
                                 native=native)
        for blk in bsa.blocks():
            w.feed(blk)
        bsa.close()
        w.finish(conv, nodes, names)
        outs.append(base)
    for ext in ("1", "2", "3", "4"):
        assert filecmp.cmp(f"{outs[0]}.{ext}.cf", f"{outs[1]}.{ext}.cf",
                           shallow=False), f".{ext}.cf differs"


def test_fasta_streaming_chunks_match_whole_file():
    """_iter_fasta with a tiny chunk size (forcing header/body splits at
    every boundary) parses identically to one-shot reads."""
    from centrifuge_tpu.build.ref_read import _iter_fasta
    fx = os.path.join(fixture_path("synth"), "db.fa")
    whole = list(_iter_fasta(fx, chunksize=1 << 30))
    tiny = list(_iter_fasta(fx, chunksize=7))
    assert whole == tiny
    assert len(whole) == 24


@pytest.mark.parametrize("dcv", [32, 128, 512])
def test_blockwise_nonsquare_dcv(tmp_path, dcv):
    """Non-square power-of-two difference-cover periods (v = 2^odd).

    The cover's stride multiples reach (r-1)*r = 2v - r there and must
    reduce mod v; round 3 fixed a heap overflow in build_cover for
    these periods, so every dcv the CLI accepts now builds correctly."""
    fx = fixture_path("synth")
    base = str(tmp_path / "idx")
    build_index([os.path.join(fx, "db.fa")], base,
                os.path.join(fx, "conv.dmp"), os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"), bmax=120000, dcv=dcv,
                blockwise=True)
    for ext in ("1", "2", "4"):
        assert filecmp.cmp(f"{base}.{ext}.cf",
                           os.path.join(fx, f"synth.{ext}.cf"),
                           shallow=False), f".{ext}.cf differs"
