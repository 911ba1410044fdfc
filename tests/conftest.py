"""Test harness: force an 8-device virtual CPU platform so sharding tests
run anywhere, and keep compilation times small."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
