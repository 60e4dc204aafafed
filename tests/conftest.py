"""Test environment: CPU platform with 8 virtual devices so multi-chip
sharding paths run without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env-var route is bypassed when a TPU platform plugin (axon) is
# installed; the config route always works and must run before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def small_grid(rng):
    """A smooth 24^3 test volume in [0, 1]."""
    n = 24
    z, y, x = np.meshgrid(
        np.linspace(0, 1, n), np.linspace(0, 1, n), np.linspace(0, 1, n),
        indexing="ij")
    g = 0.5 + 0.5 * np.sin(6 * x) * np.cos(5 * y) * np.sin(4 * z + 1.0)
    return g.astype(np.float32)
