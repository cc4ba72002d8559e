"""Test configuration.

Numeric tests run on whatever backend is default (the real TPU when
attached — compiles are far faster there; plain CPU otherwise).  Sharding
tests need a multi-device mesh, so we always expose 8 virtual CPU devices
via XLA_FLAGS — access them with `jax.devices("cpu")` regardless of the
default backend.

(NOTE: the axon TPU plugin ignores JAX_PLATFORMS; use JAX_PLATFORM_NAME=cpu
to force pure-CPU runs of this suite.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def cpu_mesh_devices():
    """8 virtual CPU devices for jax.sharding.Mesh tests."""
    import jax
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest expected 8 virtual CPU devices"
    return devs[:8]
