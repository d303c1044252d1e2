"""Flagship-shape TP train step on the virtual CPU mesh.

The forward-parity test (test_sharding.py::TestTPFlagshipShapes) covers
TP numerics at the real gaugan@256 kernel sizes; this file exercises the
full *train step* — discriminator phase + two Adam updates, the
reference's exact step semantics (model.py:451-504) — at those same
flagship shapes (channel plan 1024..128, latent 256, DP2 x TP2, batch 2)
and asserts the compiled HLO carries no all-to-all / collective-permute
and a bounded all-reduce count, then executes one step and checks every
metric is finite and the TP-sharded parameters actually updated.

A single-device numerics rerun at these shapes would double an already
heavy compile (measured ~2-4 min on a 1-core CI host), so parity is
covered compositionally: tiny-shape DP4xTP2 train-step parity
(test_sharding.py::TestDPTraining::test_dp4_tp2) + flagship-shape forward
parity.  Gated behind MOONSR_FLAGSHIP_TP=0 for constrained hosts.
"""

import os

import jax
import numpy as np
import pytest

from moonsuperresolution_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_state_for_dp_tp,
)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 4,
                       reason="needs 4 virtual devices"),
    pytest.mark.skipif(os.environ.get("MOONSR_FLAGSHIP_TP") == "0",
                       reason="flagship TP step disabled by env"),
]


def test_gaugan_flagship_train_step_dp2_tp2():
    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    cfg = TrainConfig(
        # Real flagship kernel sizes (networks.py:37-57): default channel
        # plan (1024,1024,1024,512,256,128), latent 256.  image_size 256
        # and batch 2 match run_GAN.sh-scale training (train_spade_256.py).
        # fuse_spade_gb off under TP (fused gamma/beta slices channels).
        model=ModelConfig(variant="gaugan", image_size=256, latent_dim=256,
                          compute_dtype="float32", fuse_spade_gb=False),
        batch_size=2,
    )
    tr = GauGANTrainer(cfg)
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    state = shard_state_for_dp_tp(tr.init(jax.random.PRNGKey(0)), mesh,
                                  min_dim=512)

    # TP must actually engage on the big generator kernels.
    spec = jax.tree_util.tree_map(lambda x: x.sharding.spec, state.params)
    assert spec["generator"]["resblock_0"]["conv_1"]["kernel"][-1] == "model"
    assert spec["generator"]["resblock_0"]["conv_2"]["kernel"][-2] == "model"

    rng = np.random.default_rng(0)
    src = rng.standard_normal((2, 256, 256, 2)).astype(np.float32) * 0.2
    tgt = rng.standard_normal((2, 256, 256, 1)).astype(np.float32) * 0.2
    bsrc, btgt = shard_batch((src, tgt), mesh)
    key = jax.random.PRNGKey(1)

    compiled = tr._train_step.lower(state, bsrc, btgt, key,
                                    tr.vgg_params).compile()
    hlo = compiled.as_text()
    assert "all-to-all" not in hlo
    assert "collective-permute" not in hlo
    # Same collective budget as the driver gate (__graft_entry__.py): DP
    # grad psums + TP row-parallel partial sums for both phases, with
    # headroom for XLA fission — a wasteful-but-legal pattern can't hide.
    import re
    n_ar = len(re.findall(r"= \S+ all-reduce(?:-start)?\(", hlo))
    assert n_ar <= 64, f"all-reduce count {n_ar} exceeds budget"

    before = float(np.asarray(
        jax.device_get(state.params["generator"]["resblock_0"]["conv_1"]
                       ["kernel"])).std())
    state2, metrics, fake = compiled(state, bsrc, btgt, key, tr.vgg_params)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert np.isfinite(np.asarray(fake)).all()
    k2 = state2.params["generator"]["resblock_0"]["conv_1"]["kernel"]
    assert k2.sharding.spec[-1] == "model"  # update preserved TP
    assert float(np.asarray(jax.device_get(k2)).std()) != before  # moved
