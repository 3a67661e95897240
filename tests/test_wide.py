"""Wide path (int64 rows, 64-bit occ checkpoints) for indexes >= 2^31 bases.

A real >2 Gbp index cannot be built in test time, so the wide kernels are
exercised on the synth fixture with wide=True forced: identical semantics,
64-bit dtypes and the lo/hi occ layout. Runs in a subprocess because
jax x64 mode is process-global.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
from centrifuge_tpu.index.cf_io import load_cf_index
from centrifuge_tpu.ops.fm_jax import DeviceFMIndex, make_resolver
from centrifuge_tpu.classify.engine import BatchSearchEngine
from centrifuge_tpu.io.fastx import read_batch

fx = %(fx)r
idx = load_cf_index(fx + '/synth')
wide = DeviceFMIndex.build(idx, wide=True)
narrow = DeviceFMIndex.build(idx, wide=False)
assert wide.blocks.shape[1] == 40 and narrow.blocks.shape[1] == 36

reads = read_batch([fx + '/reads.fq'], limit=64)
COMP = np.array([3, 2, 1, 0, 4], np.uint8)
seqs = []
for r in reads:
    seqs.append(r.seq)
    seqs.append(COMP[r.seq[::-1]])

ew, en = BatchSearchEngine(wide), BatchSearchEngine(narrow)
rw = ew.search(seqs)
rn = en.search(seqs)
for k in range(6):
    np.testing.assert_array_equal(np.asarray(rw[k], np.int64),
                                  np.asarray(rn[k], np.int64)), k
print('search parity OK')

# resolver parity on random rows
rng = np.random.default_rng(0)
rows = rng.integers(0, idx.bwt_len, 2048)
tw = np.asarray(make_resolver(wide)(rows.astype(np.int64)))
tn = np.asarray(make_resolver(narrow)(rows.astype(np.int32)))
np.testing.assert_array_equal(tw, tn)
print('resolver parity OK')

# full pipeline byte parity (wide device arrays end to end)
from centrifuge_tpu.classify.tpu_pipeline import TPUClassificationPipeline
pipe = TPUClassificationPipeline(idx, wide=True)
assert pipe.native is not None
all_reads = read_batch([fx + '/reads.fq'], limit=500)
rows_out = pipe.classify_batch_unpaired(all_reads)
golden = open(fx + '/golden_output.tsv').read().splitlines()[1:]
assert rows_out == golden[: len(rows_out)], 'wide pipeline != golden'
print('wide pipeline parity OK')
"""


def test_wide_path_parity():
    fx = os.path.join(REPO, "tests", "fixtures", "synth")
    script = _SCRIPT % {"repo": REPO, "fx": fx}
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=600,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert "search parity OK" in r.stdout
    assert "resolver parity OK" in r.stdout
    assert "wide pipeline parity OK" in r.stdout


def test_narrow_build_rejects_giant_without_x64():
    """The guard message must tell the user how to enable the wide path."""
    import numpy as np
    import pytest
    from centrifuge_tpu.index.cf_io import CFIndex
    from centrifuge_tpu.ops.fm_jax import DeviceFMIndex

    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 already on in this process")
    fake = CFIndex.__new__(CFIndex)
    fake.bwt_len = 1 << 31
    with pytest.raises(RuntimeError, match="wide path"):
        DeviceFMIndex.build(fake)


_PACK_SCRIPT = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
import jax.numpy as jnp
from centrifuge_tpu.classify.engine import (_pack_search_outputs,
                                            _unpack_search_outputs)
rng = np.random.default_rng(7)
L, mh = 64, 16
top = rng.integers(0, (1 << 36) - 1, (L, mh), dtype=np.int64)
bot = np.minimum(top + rng.integers(0, 1 << 35, (L, mh), dtype=np.int64),
                 (1 << 36) - 2)
top[0, :3] = -1
bot[0, :3] = -1
top[1, 0] = (1 << 36) - 2
bot[1, 0] = (1 << 36) - 2
off = rng.integers(0, 1 << 14, (L, mh), dtype=np.int64)
ln = rng.integers(0, 1 << 14, (L, mh), dtype=np.int64)
nh = rng.integers(0, mh + 1, L, dtype=np.int32)
sm = rng.integers(0, 1 << 14, L, dtype=np.int32)
packed = np.asarray(_pack_search_outputs(
    jnp.asarray(top), jnp.asarray(bot), jnp.asarray(off),
    jnp.asarray(ln), jnp.asarray(nh), jnp.asarray(sm), jnp.int64, 2))
t2, b2, o2, l2, n2, s2 = _unpack_search_outputs(packed, mh, 2)
np.testing.assert_array_equal(t2, top)
np.testing.assert_array_equal(b2, bot)
np.testing.assert_array_equal(o2, off)
np.testing.assert_array_equal(l2, ln)
np.testing.assert_array_equal(n2, nh)
np.testing.assert_array_equal(s2, sm)
print('PACK_OK')
"""


def test_wide_compact_pack_roundtrip():
    """Mode-2 output packing must round-trip int64 hit rows at real
    >2^31 magnitudes (incl. the -1 empty sentinel and the 2^36-2 max).
    Runs under x64 in a subprocess (x64 is process-global)."""
    out = subprocess.run(
        [sys.executable, "-c", _PACK_SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=300)
    assert "PACK_OK" in out.stdout, out.stderr[-2000:]
