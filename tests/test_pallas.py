"""Pallas rank kernel: interpret-mode parity with the XLA path.

Mosaic cannot lower the per-lane dynamic row read on current TPUs (no
vector gather unit) -- see the module docstring for the measured
analysis; the production engine uses merged XLA gathers instead.
"""

import jax.numpy as jnp
import numpy as np

from centrifuge_tpu.ops.fm_jax import DeviceFMIndex, rank_kernel
from centrifuge_tpu.ops.pallas_rank import (pallas_rank_available,
                                            rank_with_pallas)


def test_pallas_rank_interpret_parity(synth_index):
    fm = DeviceFMIndex.build(synth_index)
    assert pallas_rank_available(fm.blocks.shape)
    rng = np.random.default_rng(1)
    B = 2048
    rows = jnp.asarray(rng.integers(0, synth_index.bwt_len, B).astype(np.int32))
    chars = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))
    want = np.asarray(rank_kernel(fm.blocks, jnp.int32(fm.zoff), rows, chars))
    got = np.asarray(rank_with_pallas(fm.blocks, jnp.int32(fm.zoff), rows,
                                      chars, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_vmem_budget_guard():
    assert not pallas_rank_available((10**6, 36))  # 144 MB >> VMEM
