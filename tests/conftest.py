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
    _flags += " --xla_force_host_platform_device_count=8"
# 8 virtual SPMD device threads share one core here: a collective's last
# arriver trails by the others' serialized compute, so XLA's default 20 s /
# 40 s CPU-rendezvous stuck/terminate timeouts misfire on scheduling
# jitter.  Raise them — collective *structure* is checked explicitly in
# test_sharding (no all-to-all / collective-permute in the step HLO).
for _f in (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=240",
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
):
    if _f.split("=")[0] not in _flags:
        _flags += " " + _f
os.environ["XLA_FLAGS"] = _flags.strip()

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
