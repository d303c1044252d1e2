"""True multi-process runtime test: two CPU processes, one coordinator.

Validates the multi-host plumbing the reference never had (SURVEY §2.2
comm-backend row): ``parallel.distributed.initialize`` against a shared
coordinator, a global mesh spanning both processes, per-process local batch
shards assembled into one global data-sharded array, and a jitted
psum-carrying computation whose result agrees with the single-process value.

Runs two real subprocesses (slow, ~1 min); skipped with MOONSR_SKIP_MP=1.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

from moonsuperresolution_tpu.parallel import distributed

pid = int(sys.argv[1])
distributed.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 local x 2 processes

import numpy as np
import jax.numpy as jnp
from moonsuperresolution_tpu.parallel.mesh import make_mesh

mesh = make_mesh((8, 1))

# Each process contributes a disjoint local half of the global batch.
local = np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * pid
(g,) = jax.tree_util.tree_leaves(distributed.global_batch((local,), mesh))
assert g.shape == (8, 2), g.shape

@jax.jit
def step(x):
    # batch-mean triggers a cross-host psum under GSPMD
    return jnp.mean(x * 2.0)

out = float(step(g))
expected = float(
    np.mean(np.concatenate([
        np.arange(8, dtype=np.float32).reshape(4, 2),
        np.arange(8, dtype=np.float32).reshape(4, 2) + 100,
    ]) * 2.0)
)
assert abs(out - expected) < 1e-5, (out, expected)
print(f"proc {pid} OK {out}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("MOONSR_SKIP_MP") == "1",
                    reason="multi-process test disabled")
def test_two_process_mesh_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
