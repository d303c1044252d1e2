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
    """Megatron pairing: conv_1/conv_3 column-parallel, conv_2 row-parallel,
    latent dense row-parallel, everything else (SPADE gamma/beta, encoder,
    discriminator) replicated — the pairing that keeps the step HLO free of
    all-to-alls."""
    P = jax.sharding.PartitionSpec
    mesh = make_mesh((4, 2))
    rule = param_sharding_rules(mesh, min_dim=512)
    kin = np.zeros((3, 3, 128, 1024), np.float32)     # conv_1-shaped
    ksq = np.zeros((3, 3, 1024, 1024), np.float32)    # conv_2-shaped
    assert rule("generator/resblock_0/conv_1/kernel", kin).spec[-1] == "model"
    assert rule("generator/resblock_2/conv_3/kernel", kin).spec[-1] == "model"
    assert rule("generator/resblock_0/conv_2/kernel", ksq).spec[-2] == "model"
    dense = np.zeros((32, 1024), np.float32)
    assert rule("generator/dense/kernel", dense).spec[0] == "model"
    # Adam moments repeat the param paths under mu/nu and follow suit.
    assert rule("mu/generator/resblock_0/conv_1/kernel", kin).spec[-1] == \
        "model"
    # Replicated: SPADE gamma/beta (the fused concat stays local), the
    # narrow late resblocks, non-generator kernels, biases, odd widths.
    assert rule("generator/resblock_0/spade_1/conv_gamma/kernel",
                kin).spec == P()
    assert rule("discriminator/block_3/conv/kernel", kin).spec == P()
    small = np.zeros((3, 3, 128, 128), np.float32)
    assert rule("generator/resblock_5/conv_1/kernel", small).spec == P()
    assert rule("generator/resblock_0/conv_1/bias",
                np.zeros((1024,), np.float32)).spec == P()
    odd = np.zeros((3, 3, 128, 1023), np.float32)  # not divisible
    assert rule("generator/resblock_0/conv_1/kernel", odd).spec == P()


class TestDPTraining:
    @pytest.fixture(scope="class")
    def setup(self):
        from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
        from moonsuperresolution_tpu.train import make_trainer

        cfg = TrainConfig(
            # unfused SPADE gamma/beta on multi-device meshes (the fused
            # conv's channel-sliced output would force collective-permutes
            # under TP — see ModelConfig.fuse_spade_gb); the fused path is
            # covered by the model/parity tests.
            model=ModelConfig(variant="cnn_spade", image_size=64,
                              latent_dim=16, fuse_spade_gb=False),
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
        # One compile: assert the DP x TP step HLO is all-to-all-free (the
        # collective whose CPU rendezvous flaked the round-2 gate; the
        # Megatron-paired rules are designed to avoid it), then execute the
        # same executable.
        key = jax.random.PRNGKey(1)
        compiled = tr._train_step.lower(state_sh, bsrc, btgt, key,
                                        tr.vgg_params).compile()
        hlo = compiled.as_text()
        assert "all-to-all" not in hlo
        assert "collective-permute" not in hlo
        s2, m2, _ = compiled(state_sh, bsrc, btgt, key, tr.vgg_params)
        s1, m1, _ = tr.train_step(state, jnp.asarray(src), jnp.asarray(tgt),
                                  jax.random.PRNGKey(1))
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-3, atol=1e-4)


class TestTPFlagshipShapes:
    def test_gaugan_256_forward_parity_dp2_tp2(self):
        """Generator-forward parity at the real flagship shapes (gaugan
        @256, latent 256 — networks.py:37-57 kernel sizes) under DP2 x TP2:
        the Megatron-paired shardings must not change the numerics."""
        from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
        from moonsuperresolution_tpu.train.trainers import GauGANTrainer

        cfg = TrainConfig(
            model=ModelConfig(variant="gaugan", image_size=256,
                              latent_dim=256, compute_dtype="float32",
                              fuse_spade_gb=False),
            batch_size=2,
        )
        tr = GauGANTrainer(cfg)
        params = tr.init(jax.random.PRNGKey(0)).params
        rng = np.random.default_rng(0)
        src = rng.standard_normal((2, 256, 256, 2)).astype(np.float32) * 0.2

        out1 = np.asarray(tr.forward(params, jnp.asarray(src),
                                     jax.random.PRNGKey(1)))

        mesh = make_mesh((2, 2), devices=jax.devices()[:4])
        from moonsuperresolution_tpu.parallel.mesh import (
            _path_str,
            param_sharding_rules,
        )

        rule = param_sharding_rules(mesh, min_dim=512)
        sharded_params = jax.device_put(
            params,
            jax.tree_util.tree_map_with_path(
                lambda path, x: rule(_path_str(path), x), params
            ),
        )
        # Assert TP actually engages on the big kernels at these shapes.
        spec = jax.tree_util.tree_map(
            lambda x: x.sharding.spec, sharded_params
        )
        assert spec["generator"]["resblock_0"]["conv_1"]["kernel"][-1] == \
            "model"
        assert spec["generator"]["resblock_0"]["conv_2"]["kernel"][-2] == \
            "model"
        assert spec["generator"]["dense"]["kernel"][0] == "model"

        bsrc = shard_batch(src, mesh)
        out2 = np.asarray(tr.forward(sharded_params, bsrc,
                                     jax.random.PRNGKey(1)))
        np.testing.assert_allclose(out1, out2, rtol=2e-3, atol=2e-4)


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
