"""Test configuration: force a virtual 8-device CPU mesh.

Env vars alone are not enough in this environment — a sitecustomize hook
registers a TPU PJRT plugin and re-prioritizes the platform list at
interpreter startup, so we also pin the platform via jax.config before any
backend initializes.  All unit tests run on CPU so CI needs no TPU;
multi-chip sharding tests use the 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
