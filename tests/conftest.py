"""Test harness: force an 8-device virtual CPU platform so sharding tests
run anywhere, and keep the tunnelled TPU out of unit tests.

NOTE: this container pre-imports jax at interpreter startup and sets
`jax_platforms="axon,cpu"` through jax.config (not the env var), so the
only reliable override is jax.config.update — env vars are too late.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
