"""Test configuration: force a virtual 8-device CPU mesh.

Must run before jax initializes its backends, hence env mutation at import
time.  All unit tests run on CPU so CI needs no TPU; multi-chip sharding
tests use the 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
