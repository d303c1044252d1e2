"""Trainer-level tests: one jitted step per variant, state updates, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonsuperresolution_tpu.config import ModelConfig, OptimizerConfig, TrainConfig
from moonsuperresolution_tpu.train import make_trainer


def _batch(rng, b=2, hw=64):
    src = rng.standard_normal((b, hw, hw, 2)).astype(np.float32) * 0.2
    tgt = rng.standard_normal((b, hw, hw, 1)).astype(np.float32) * 0.2
    return jnp.asarray(src), jnp.asarray(tgt)


def _fresh(host_state):
    """Device copy of a host-resident state.  train_step donates its input
    state, so shared fixtures hold the state on host and every test gets a
    fresh device copy."""
    return jax.tree_util.tree_map(jnp.asarray, host_state)


@pytest.fixture(scope="module")
def cnn_trainer():
    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16),
        batch_size=2,
    )
    tr = make_trainer(cfg)
    return tr, jax.device_get(tr.init(jax.random.PRNGKey(0)))


class TestCNNSpade:
    def test_step_updates_and_metrics(self, cnn_trainer, rng):
        tr, host_state = cnn_trainer
        state = _fresh(host_state)
        src, tgt = _batch(rng)
        new_state, metrics, fake = tr.train_step(state, src, tgt,
                                                 jax.random.PRNGKey(1))
        assert int(new_state.step) == int(host_state.step) + 1
        assert fake.shape == (2, 64, 64, 1)
        for k in ("total_loss", "mse_loss", "vgg_loss", "cons_loss",
                  "norm_loss", "grad_loss"):
            assert np.isfinite(float(metrics[k])), k
        # params actually moved
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
            host_state.params, new_state.params)
        assert max(jax.tree_util.tree_leaves(d)) > 0

    def test_deterministic_latent(self, cnn_trainer, rng):
        """CNNSpade's latent is mean+logvar — no sampling, so two forwards
        with different rngs agree (model.py:727-728, 789-791)."""
        tr, host_state = cnn_trainer
        state = _fresh(host_state)
        src, _ = _batch(rng)
        a = tr.forward(state.params, src, jax.random.PRNGKey(1))
        b = tr.forward(state.params, src, jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_val_step_no_update(self, cnn_trainer, rng):
        tr, host_state = cnn_trainer
        state = _fresh(host_state)
        src, tgt = _batch(rng)
        metrics, fake = tr.val_step(state.params, src, tgt,
                                    jax.random.PRNGKey(1))
        assert fake.shape == (2, 64, 64, 1)
        assert np.isfinite(float(metrics["total_loss"]))


class TestGauGAN:
    @pytest.fixture(scope="class")
    def gaugan(self):
        cfg = TrainConfig(
            model=ModelConfig(variant="gaugan", image_size=64, latent_dim=16),
            batch_size=2,
        )
        tr = make_trainer(cfg)
        return tr, jax.device_get(tr.init(jax.random.PRNGKey(0)))

    def test_two_optimizers(self, gaugan, rng):
        tr, host_state = gaugan
        state = _fresh(host_state)
        src, tgt = _batch(rng)
        s1, metrics, _ = tr.train_step(state, src, tgt, jax.random.PRNGKey(1))
        assert "disc_loss" in metrics and "gen_loss" in metrics
        assert "kl_loss" in metrics
        # both discriminator and generator params moved
        dd = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
            host_state.params["discriminator"], s1.params["discriminator"])
        dg = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
            host_state.params["generator"], s1.params["generator"])
        assert max(jax.tree_util.tree_leaves(dd)) > 0
        assert max(jax.tree_util.tree_leaves(dg)) > 0

    def test_stochastic_forward(self, gaugan, rng):
        """GauGAN draws z per forward — different rngs give different output
        (the Monte-Carlo uncertainty source, sampling.py:11-17)."""
        tr, host_state = gaugan
        state = _fresh(host_state)
        src, _ = _batch(rng)
        a = tr.forward(state.params, src, jax.random.PRNGKey(1))
        b = tr.forward(state.params, src, jax.random.PRNGKey(2))
        assert float(jnp.abs(a - b).max()) > 0


def test_checkpoint_roundtrip(cnn_trainer, tmp_path, rng):
    from moonsuperresolution_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    tr, host_state = cnn_trainer
    src, tgt = _batch(rng)
    state2, _, _ = tr.train_step(_fresh(host_state), src, tgt,
                                 jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt")
    host2 = jax.device_get(state2)
    save_checkpoint(path, host2)
    restored = restore_checkpoint(path, template=host2)
    assert int(restored.step) == int(host2.step)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(restored.params, host2.params)
    # restored state continues training identically
    host2 = jax.device_get(state2)
    a, ma, _ = tr.train_step(_fresh(host2), src, tgt, jax.random.PRNGKey(5))
    b, mb, _ = tr.train_step(_fresh(restored), src, tgt, jax.random.PRNGKey(5))
    assert np.isclose(float(ma["total_loss"]), float(mb["total_loss"]))


def test_bf16_mixed_precision_close_to_fp32(rng):
    """bfloat16 compute with fp32 params/norms stays close to the fp32
    forward and trains with finite losses."""
    import dataclasses

    cfg32 = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16),
        batch_size=2,
    )
    cfg16 = dataclasses.replace(
        cfg32, model=dataclasses.replace(cfg32.model,
                                         compute_dtype="bfloat16"))
    tr32 = make_trainer(cfg32)
    tr16 = make_trainer(cfg16)
    host = jax.device_get(tr32.init(jax.random.PRNGKey(0)))
    src, tgt = _batch(rng)

    f32 = tr32.forward(host.params, src, jax.random.PRNGKey(1))
    f16 = tr16.forward(host.params, src, jax.random.PRNGKey(1))
    assert f16.dtype == jnp.float32  # head casts back
    # bf16 matmuls: loose but bounded deviation
    assert float(jnp.abs(f32 - f16).mean()) < 0.05

    state = _fresh(host)
    state, m, _ = tr16.train_step(state, src, tgt, jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in m.values())
    # params remain fp32
    dt = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.dtype, state.params))
    assert all(d == jnp.float32 for d in dt)


def test_training_from_h5_dataset(tmp_path, rng):
    """Close the loop: h5 tile store (reference artifact format) ->
    TileSampler -> trainer steps."""
    import pickle

    import h5py

    from moonsuperresolution_tpu.data.h5_builder import tile_pair
    from moonsuperresolution_tpu.data.sampler import TileSampler

    h5_path = str(tmp_path / "tiles.hdf5")
    dct = {}
    ort = (rng.random((2000, 2000)) * 255).astype(np.float32)
    dem = (rng.random((2000, 2000)) * 4000).astype(np.float32)
    with h5py.File(h5_path, "w") as h5:
        h5, dct = tile_pair(ort, dem, "R", h5, dct)
    pkl = str(tmp_path / "k.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(dct, f)

    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16),
        batch_size=2,
    )
    tr = make_trainer(cfg)
    state = tr.init(jax.random.PRNGKey(0))
    sampler = TileSampler(h5_path, pkl, hw=64, seed=0)
    n = 0
    for x, y in sampler.batches(2):
        state, m, _ = tr.train_step(state, jnp.asarray(x), jnp.asarray(y),
                                    jax.random.PRNGKey(n))
        n += 1
        if n == 2:
            break
    assert n == 2 and np.isfinite(float(m["total_loss"]))
