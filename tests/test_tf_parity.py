"""Parity tests against the actual TensorFlow ops the reference builds on.

The reference's numerics live in TF ops (tf.image.image_gradients, keras
Hinge/AveragePooling2D, tf.nn.moments, tf.image.resize, Conv2D SAME padding).
These tests check our JAX reimplementations against the real TF ops on random
inputs — this is the op-level half of the fidelity bridge (the checkpoint
importer is the other half).

TF import is slow; the whole module skips cleanly when TF is unavailable.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from moonsuperresolution_tpu import losses as L  # noqa: E402
from moonsuperresolution_tpu.ops import (  # noqa: E402
    area_downscale,
    image_gradients,
    resize_nearest,
)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    b = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    return a, b


class TestOps:
    def test_image_gradients(self, imgs):
        a, _ = imgs
        tdy, tdx = tf.image.image_gradients(tf.constant(a))
        jdy, jdx = image_gradients(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(jdy), tdy.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(jdx), tdx.numpy(), atol=1e-6)

    def test_nearest_resize(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 13, 17, 3)).astype(np.float32)
        for out_hw in [(26, 34), (7, 9), (13, 17), (4, 32)]:
            t = tf.image.resize(tf.constant(x), out_hw, method="nearest").numpy()
            j = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
            np.testing.assert_array_equal(j, t), out_hw

    def test_avg_pool_consistency(self, imgs):
        a, _ = imgs
        pool = tf.keras.layers.AveragePooling2D(pool_size=(4, 4), strides=4,
                                                padding="valid")
        t = pool(tf.constant(a)).numpy()
        j = np.asarray(area_downscale(jnp.asarray(a), 4))
        np.testing.assert_allclose(j, t, atol=1e-6)

    def test_moments_normalization(self, imgs):
        """The SPADE normalization core: tf.nn.moments over (0,1,2)
        (spade/models/spade.py:21-24)."""
        a, _ = imgs
        mean, var = tf.nn.moments(tf.constant(a), axes=(0, 1, 2),
                                  keepdims=True)
        t = ((a - mean.numpy()) / np.sqrt(var.numpy() + 1e-5))
        jm = np.mean(a, axis=(0, 1, 2), keepdims=True)
        jv = np.var(a, axis=(0, 1, 2), keepdims=True)
        j = (a - jm) / np.sqrt(jv + 1e-5)
        np.testing.assert_allclose(j, t, rtol=1e-4, atol=1e-5)


class TestLosses:
    def test_hinge(self, imgs):
        a, _ = imgs
        hinge = tf.keras.losses.Hinge()
        t_real = float(hinge(tf.ones_like(a), tf.constant(a)))
        t_fake = float(hinge(-tf.ones_like(a), tf.constant(a)))
        assert np.isclose(
            float(L.discriminator_hinge_loss(jnp.asarray(a), True)), t_real,
            rtol=1e-5)
        assert np.isclose(
            float(L.discriminator_hinge_loss(jnp.asarray(a), False)), t_fake,
            rtol=1e-5)

    def test_mae_mse(self, imgs):
        a, b = imgs
        t_mae = float(tf.keras.losses.MeanAbsoluteError()(a, b))
        t_mse = float(tf.keras.losses.MeanSquaredError()(a, b))
        assert np.isclose(float(L.mae_loss(jnp.asarray(a), jnp.asarray(b))),
                          t_mae, rtol=1e-5)
        assert np.isclose(float(L.mse_loss(jnp.asarray(a), jnp.asarray(b))),
                          t_mse, rtol=1e-5)

    def test_bce_from_logits(self, imgs):
        a, _ = imgs
        bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)
        t = float(bce(tf.ones_like(a), tf.constant(a)))
        j = float(L.bce_with_logits(jnp.asarray(a), jnp.ones_like(jnp.asarray(a))))
        assert np.isclose(j, t, rtol=1e-4)

    def test_consistency_vs_keras_pool(self, imgs):
        a, b = imgs
        pool = tf.keras.layers.AveragePooling2D((4, 4), strides=4,
                                                padding="valid")
        t = float(tf.keras.losses.MeanSquaredError()(pool(tf.constant(a)),
                                                     pool(tf.constant(b))))
        j = float(L.consistency_loss(jnp.asarray(a), jnp.asarray(b), 4))
        assert np.isclose(j, t, rtol=1e-4)


class TestConvPadding:
    """Weight-layout and SAME-padding parity — the foundation the checkpoint
    importer rests on."""

    def test_strided_conv_same(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 15, 15, 3)).astype(np.float32)
        k = rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.1

        t_conv = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same",
                                        use_bias=False)
        t_conv.build((None, 15, 15, 3))
        t_conv.set_weights([k])
        t = t_conv(tf.constant(x)).numpy()

        import flax.linen as nn
        import jax

        m = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = {"params": {"kernel": jnp.asarray(k)}}
        j = np.asarray(m.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(j, t, rtol=1e-4, atol=1e-5)

    def test_conv_transpose_same(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        # Keras Conv2DTranspose kernel layout: (kh, kw, out, in)
        k = rng.standard_normal((4, 4, 6, 4)).astype(np.float32) * 0.1

        t_conv = tf.keras.layers.Conv2DTranspose(6, 4, strides=2,
                                                 padding="same",
                                                 use_bias=False)
        t_conv.build((None, 8, 8, 4))
        t_conv.set_weights([k])
        t = t_conv(tf.constant(x)).numpy()

        import flax.linen as nn
        import jax

        m = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, transpose_kernel=True)
        # flax transpose_kernel=True expects (kh, kw, out, in) = Keras layout
        params = {"params": {"kernel": jnp.asarray(k)}}
        j = np.asarray(m.apply(params, jnp.asarray(x)))
        assert j.shape == t.shape == (1, 16, 16, 6)
        np.testing.assert_allclose(j, t, rtol=1e-4, atol=1e-5)
