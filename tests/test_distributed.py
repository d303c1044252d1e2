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


_TRAIN_WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

from moonsuperresolution_tpu.parallel import distributed

pid = int(sys.argv[1])
ckdir = sys.argv[3]
variant = sys.argv[4] if len(sys.argv) > 4 else "cnn_spade"
mesh_shape = tuple(int(v) for v in sys.argv[5].split("x")) \
    if len(sys.argv) > 5 else (8, 1)
min_dim = int(sys.argv[6]) if len(sys.argv) > 6 else 512
distributed.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from jax.experimental import multihost_utils

from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
from moonsuperresolution_tpu.parallel.distributed import global_batch
from moonsuperresolution_tpu.parallel.mesh import (
    make_mesh, shard_state_for_dp_tp,
)
from moonsuperresolution_tpu.train.trainers import GauGANTrainer
from moonsuperresolution_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)

cfg = TrainConfig(
    # Tiny channel plan: the test validates multi-host *plumbing* (global
    # mesh, data shards, cross-process psum, collective checkpoint), not
    # model scale — the reference-width plan made two concurrent XLA
    # compiles blow past the test timeout on small CI hosts.  The gaugan
    # variant widens the first two blocks to 64 so min_dim=64 TP-shards
    # them (fuse_spade_gb off: fused gamma/beta forces permutes under TP).
    model=ModelConfig(variant=variant, image_size=64, latent_dim=16,
                      channel_plan=((64, 64, 32, 32, 16, 8)
                                    if variant == "gaugan"
                                    else (32, 32, 32, 16, 16, 8)),
                      encoder_filters=8, disc_filters=8,
                      fuse_spade_gb=mesh_shape[1] == 1),
    batch_size=8,
)
tr = GauGANTrainer(cfg)
mesh = make_mesh(mesh_shape)  # global: 4 local devices x 2 processes
state = shard_state_for_dp_tp(tr.init(jax.random.PRNGKey(0)), mesh,
                              min_dim=min_dim)

rng = np.random.default_rng(0)
src = rng.standard_normal((8, 64, 64, 2)).astype(np.float32) * 0.2
tgt = rng.standard_normal((8, 64, 64, 1)).astype(np.float32) * 0.2
# Each process contributes its disjoint half of the global batch (the same
# rows a single-process run would place on those devices).
lo, hi = (0, 4) if pid == 0 else (4, 8)
gsrc, gtgt = global_batch((src[lo:hi], tgt[lo:hi]), mesh)

state, metrics, fake = tr.train_step(state, gsrc, gtgt,
                                     jax.random.PRNGKey(1))
jax.block_until_ready(fake)
print("METRICS1 " + json.dumps({k: float(v) for k, v in metrics.items()}),
      flush=True)

# ---- multi-host checkpoint round trip: replicated state -> host -> Orbax
# -> all restore -> resume one more step.  Orbax's Checkpointer.save is a
# *collective* (it runs sync_global_processes barriers internally), so every
# process must call it; the numpy type handler writes only on the primary.
host_state = jax.tree_util.tree_map(
    lambda x: np.asarray(jax.device_get(x)), state)
path = os.path.join(ckdir, "step1")
save_checkpoint(path, host_state)
multihost_utils.sync_global_devices("moonsr_ckpt_saved")
restored = restore_checkpoint(path, template=host_state)
restored = shard_state_for_dp_tp(restored, mesh)
state2, metrics2, fake2 = tr.train_step(restored, gsrc, gtgt,
                                        jax.random.PRNGKey(2))
jax.block_until_ready(fake2)
assert int(state2.step) == 2, int(state2.step)
print("METRICS2 " + json.dumps({k: float(v) for k, v in metrics2.items()}),
      flush=True)
print(f"proc {pid} TRAIN OK", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, source, extra_args=()):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker = tmp_path / "worker.py"
    worker.write_text(source)
    return [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root,
        )
        for i in range(2)
    ]


@pytest.mark.skipif(os.environ.get("MOONSR_SKIP_MP") == "1",
                    reason="multi-process test disabled")
def test_two_process_train_step_and_checkpoint(tmp_path):
    """One real ``GauGANTrainer.train_step`` across 2 processes x 4 devices,
    metrics matching the single-process step, plus a multi-host Orbax
    save -> restore -> resume round trip (VERDICT r2 item 4).  Slowish: two
    concurrent XLA compiles of the (tiny-plan) step."""
    import json

    import numpy as np

    procs = _launch_workers(tmp_path, _TRAIN_WORKER,
                            extra_args=(str(tmp_path / "ckpt"),))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} TRAIN OK" in out, out

    def parse(out, tag):
        for line in out.splitlines():
            if line.startswith(tag + " "):
                return json.loads(line[len(tag) + 1 :])
        raise AssertionError(f"{tag} not found in:\n{out}")

    # Both processes report identical (replicated) metrics.
    for tag in ("METRICS1", "METRICS2"):
        m0, m1 = parse(outs[0], tag), parse(outs[1], tag)
        assert m0.keys() == m1.keys()
        for k in m0:
            np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, atol=1e-6)

    # Single-process reference: same init/data/keys, two consecutive steps
    # (an exact checkpoint round trip must not change the trajectory).
    import jax
    import jax.numpy as jnp

    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16,
                          channel_plan=(32, 32, 32, 16, 16, 8),
                          encoder_filters=8, disc_filters=8),
        batch_size=8,
    )
    tr = GauGANTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((8, 64, 64, 2)).astype(np.float32)
                      * 0.2)
    tgt = jnp.asarray(rng.standard_normal((8, 64, 64, 1)).astype(np.float32)
                      * 0.2)
    state, ref1, _ = tr.train_step(state, src, tgt, jax.random.PRNGKey(1))
    state, ref2, _ = tr.train_step(state, src, tgt, jax.random.PRNGKey(2))
    m1 = parse(outs[0], "METRICS1")
    m2 = parse(outs[0], "METRICS2")
    for k in m1:
        np.testing.assert_allclose(m1[k], float(ref1[k]), rtol=2e-3,
                                   atol=1e-4)
    for k in m2:
        np.testing.assert_allclose(m2[k], float(ref2[k]), rtol=2e-3,
                                   atol=1e-4)


@pytest.mark.skipif(os.environ.get("MOONSR_SKIP_MP") == "1",
                    reason="multi-process test disabled")
def test_two_process_gaugan_dp_tp(tmp_path):
    """Full *gaugan* train step (discriminator phase + two Adams) across 2
    real processes on a (4, 2) DP x TP mesh (VERDICT r3 item 3): the disc
    hinge phase, the frozen-disc generator phase, and the TP kernel
    shardings all exercise cross-process collectives; metrics must match a
    single-process unsharded run, and the multi-host Orbax round trip now
    carries BOTH optimizer states.  Reference semantics: model.py:451-504."""
    import json

    import numpy as np

    procs = _launch_workers(tmp_path, _TRAIN_WORKER,
                            extra_args=(str(tmp_path / "ckpt"), "gaugan",
                                        "4x2", "64"))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} TRAIN OK" in out, out

    def parse(out, tag):
        for line in out.splitlines():
            if line.startswith(tag + " "):
                return json.loads(line[len(tag) + 1 :])
        raise AssertionError(f"{tag} not found in:\n{out}")

    for tag in ("METRICS1", "METRICS2"):
        m0, m1 = parse(outs[0], tag), parse(outs[1], tag)
        assert m0.keys() == m1.keys()
        for k in m0:
            np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, atol=1e-6)

    # Single-process reference (identical init/data/keys, no mesh): the
    # two-phase GAN step's metrics include disc_loss, so the comparison
    # pins the discriminator phase's cross-process behavior too.
    import jax
    import jax.numpy as jnp

    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    cfg = TrainConfig(
        model=ModelConfig(variant="gaugan", image_size=64, latent_dim=16,
                          channel_plan=(64, 64, 32, 32, 16, 8),
                          encoder_filters=8, disc_filters=8,
                          fuse_spade_gb=False),
        batch_size=8,
    )
    tr = GauGANTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((8, 64, 64, 2)).astype(np.float32)
                      * 0.2)
    tgt = jnp.asarray(rng.standard_normal((8, 64, 64, 1)).astype(np.float32)
                      * 0.2)
    state, ref1, _ = tr.train_step(state, src, tgt, jax.random.PRNGKey(1))
    state, ref2, _ = tr.train_step(state, src, tgt, jax.random.PRNGKey(2))
    m1 = parse(outs[0], "METRICS1")
    m2 = parse(outs[0], "METRICS2")
    assert "disc_loss" in m1, sorted(m1)
    for k in m1:
        np.testing.assert_allclose(m1[k], float(ref1[k]), rtol=2e-3,
                                   atol=1e-4)
    for k in m2:
        np.testing.assert_allclose(m2[k], float(ref2[k]), rtol=2e-3,
                                   atol=1e-4)


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
