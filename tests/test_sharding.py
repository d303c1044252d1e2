"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the DP+TP sharded training step compiles, runs, and matches
single-device numerics — the reference has no distributed story at all
(SURVEY.md §2.2); this is the TPU-native replacement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonsuperresolution_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_state_for_dp_tp,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m2 = make_mesh((4, 2))
    assert m2.shape["data"] == 4 and m2.shape["model"] == 2


def test_param_rules():
    mesh = make_mesh((4, 2))
    rule = param_sharding_rules(mesh, min_dim=512)
    big = np.zeros((3, 3, 128, 1024), np.float32)
    small = np.zeros((3, 3, 16, 32), np.float32)
    bias = np.zeros((1024,), np.float32)
    assert rule(big).spec[-1] == "model"
    assert rule(small).spec == jax.sharding.PartitionSpec()
    assert rule(bias).spec == jax.sharding.PartitionSpec()
    odd = np.zeros((8, 1023), np.float32)  # not divisible -> replicate
    assert rule(odd).spec == jax.sharding.PartitionSpec()


class TestDPTraining:
    @pytest.fixture(scope="class")
    def setup(self):
        from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
        from moonsuperresolution_tpu.train import make_trainer

        cfg = TrainConfig(
            model=ModelConfig(variant="cnn_spade", image_size=64,
                              latent_dim=16),
            batch_size=8,
        )
        tr = make_trainer(cfg)
        host_state = jax.device_get(tr.init(jax.random.PRNGKey(0)))
        rng = np.random.default_rng(0)
        src = rng.standard_normal((8, 64, 64, 2)).astype(np.float32) * 0.2
        tgt = rng.standard_normal((8, 64, 64, 1)).astype(np.float32) * 0.2
        return tr, host_state, src, tgt

    def test_dp8_matches_single_device(self, setup):
        tr, host_state, src, tgt = setup
        state = jax.tree_util.tree_map(jnp.asarray, host_state)
        # single device
        s1, m1, _ = tr.train_step(state, jnp.asarray(src), jnp.asarray(tgt),
                                  jax.random.PRNGKey(1))
        # 8-way DP
        mesh = make_mesh((8, 1))
        state_sh = shard_state_for_dp_tp(tr.init(jax.random.PRNGKey(0)), mesh)
        bsrc, btgt = shard_batch((src, tgt), mesh)
        s2, m2, _ = tr.train_step(state_sh, bsrc, btgt, jax.random.PRNGKey(1))
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-3, atol=1e-4)

    def test_dp4_tp2(self, setup):
        tr, host_state, src, tgt = setup
        state = jax.tree_util.tree_map(jnp.asarray, host_state)
        mesh = make_mesh((4, 2))
        state_sh = shard_state_for_dp_tp(tr.init(jax.random.PRNGKey(0)), mesh,
                                         min_dim=512)
        bsrc, btgt = shard_batch((src, tgt), mesh)
        s2, m2, _ = tr.train_step(state_sh, bsrc, btgt, jax.random.PRNGKey(1))
        s1, m1, _ = tr.train_step(state, jnp.asarray(src), jnp.asarray(tgt),
                                  jax.random.PRNGKey(1))
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-3, atol=1e-4)


class TestShardedInference:
    def test_identity_engine_matches_single_device(self, tmp_path):
        """The spatially-sharded tile program (patch batch over 'data')
        reproduces the unsharded identity-engine output exactly."""
        import cv2
        import numpy as np

        from moonsuperresolution_tpu.config import DSRConfig
        from moonsuperresolution_tpu.geo import write_geotiff
        from moonsuperresolution_tpu.infer import DEMSuperResolution

        rng = np.random.default_rng(0)
        h, w = 200, 260
        dem = cv2.resize(rng.standard_normal((5, 7)).astype(np.float32),
                         (w, h), interpolation=cv2.INTER_CUBIC) * 100 + 1500
        ort = (cv2.resize(rng.standard_normal((10, 13)).astype(np.float32),
                          (w, h), interpolation=cv2.INTER_CUBIC) * 40 + 128
               ).clip(1, 255)
        td = str(tmp_path)
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        write_geotiff(f"{td}/run-DEM.tif", dem, gt, "P", -32768.0)
        write_geotiff(f"{td}/run-DRG.tif", ort, gt, "P", -32768.0)

        cfg = DSRConfig(image_size=64, stride=8, batch_size=16, tile_size=128,
                        source_folder_path=td, map_name="t", save_path=None)
        single = DEMSuperResolution(cfg, model=None)
        single.process_map(progress=False)

        mesh = make_mesh((8, 1))
        sharded = DEMSuperResolution(cfg, model=None, mesh=mesh)
        sharded.process_map(progress=False)

        np.testing.assert_array_equal(single.result["good"],
                                      sharded.result["good"])
        np.testing.assert_allclose(single.result["mean"],
                                   sharded.result["mean"], atol=1e-5)
        np.testing.assert_allclose(single.result["std"],
                                   sharded.result["std"], atol=1e-5)


def test_train_loop_with_mesh(tmp_path):
    """The full training loop drives DP-sharded steps end to end."""
    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.loop import train

    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16),
        batch_size=8,
        epochs=1,
        output_path=str(tmp_path),
    )
    mesh = make_mesh((8, 1))
    trainer, state, history = train(cfg, synthetic=True,
                                    max_steps_per_epoch=2, mesh=mesh,
                                    log=False)
    assert int(state.step) == 2
    assert np.isfinite(history[0]["train"]["total_loss"])
