import os
import sys

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; the bench
# path (bench.py) runs on the real chip outside pytest. A pytest plugin
# imports jax before this conftest runs and the ambient JAX_PLATFORMS pins
# the tpu tunnel, so env vars alone are too late -- force the platform via
# jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the wide (>=2^31-base) index layout needs 64-bit row dtypes; kernels pin
# their dtypes explicitly so enabling x64 globally is safe for the narrow
# paths too
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def example_index():
    from centrifuge_tpu.index.cf_io import load_cf_index
    return load_cf_index(os.path.join(FIXTURES, "example", "test"))


@pytest.fixture(scope="session")
def synth_index():
    from centrifuge_tpu.index.cf_io import load_cf_index
    return load_cf_index(os.path.join(FIXTURES, "synth", "synth"))


def fixture_path(*parts: str) -> str:
    return os.path.join(FIXTURES, *parts)
