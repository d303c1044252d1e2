"""Golden-value unit tests for the loss library (vs hand-computed numpy,
mirroring the reference semantics in spade/losses.py and pix2pix.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from moonsuperresolution_tpu import losses as L


@pytest.fixture
def imgs(rng):
    y_true = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    y_pred = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    return y_true, y_pred


def _np_grads(x):
    dy = np.zeros_like(x)
    dx = np.zeros_like(x)
    dy[:, :-1] = x[:, 1:] - x[:, :-1]
    dx[:, :, :-1] = x[:, :, 1:] - x[:, :, :-1]
    return dy, dx


def test_generator_hinge(rng):
    y = rng.standard_normal((2, 5, 5, 1)).astype(np.float32)
    assert np.isclose(float(L.generator_hinge_loss(jnp.asarray(y))), -y.mean())


def test_discriminator_hinge(rng):
    y = rng.standard_normal((2, 5, 5, 1)).astype(np.float32)
    real = np.maximum(1.0 - y, 0).mean()
    fake = np.maximum(1.0 + y, 0).mean()
    assert np.isclose(float(L.discriminator_hinge_loss(jnp.asarray(y), True)), real)
    assert np.isclose(float(L.discriminator_hinge_loss(jnp.asarray(y), False)), fake)


def test_kl_divergence(rng):
    mean = rng.standard_normal((2, 16)).astype(np.float32)
    logvar = rng.standard_normal((2, 16)).astype(np.float32)
    want = -0.5 * np.sum(1 + logvar - mean**2 - np.exp(logvar))
    got = float(L.kl_divergence_loss(jnp.asarray(mean), jnp.asarray(logvar)))
    assert np.isclose(got, want, rtol=1e-5)


def test_gradient_loss(imgs):
    y_true, y_pred = imgs
    gy_t, gx_t = _np_grads(y_true)
    gy_p, gx_p = _np_grads(y_pred)
    want = np.mean(np.abs(gx_t - gx_p) + np.abs(gy_t - gy_p))
    got = float(L.gradient_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert np.isclose(got, want, rtol=1e-5)


def test_normal_loss(imgs):
    y_true, y_pred = imgs
    gy_t, gx_t = _np_grads(y_true)
    gy_p, gx_p = _np_grads(y_pred)
    one = np.ones_like(gx_t)
    n_t = np.concatenate([-gx_t, -gy_t, one], -1)
    n_p = np.concatenate([-gx_p, -gy_p, one], -1)
    cos = (n_p * n_t).sum(-1) / (
        np.sqrt((n_t * n_t).sum(-1)) * np.sqrt((n_p * n_p).sum(-1))
    )
    want = np.mean(1 - cos)
    got = float(L.normal_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert np.isclose(got, want, rtol=1e-5)

    # identical images -> zero loss
    z = float(L.normal_loss(jnp.asarray(y_true), jnp.asarray(y_true)))
    assert abs(z) < 1e-6


def test_consistency_loss(rng):
    y_true = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    y_pred = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    for f in (4, 16):
        pt = y_true.reshape(2, 32 // f, f, 32 // f, f, 1).mean((2, 4))
        pp = y_pred.reshape(2, 32 // f, f, 32 // f, f, 1).mean((2, 4))
        want = np.mean((pt - pp) ** 2)
        got = float(L.consistency_loss(jnp.asarray(y_true), jnp.asarray(y_pred), f))
        assert np.isclose(got, want, rtol=1e-4), f


def test_consistency_loss_nondivisible(rng):
    # 'valid' pooling crops the remainder
    y = rng.standard_normal((1, 10, 10, 1)).astype(np.float32)
    z = rng.standard_normal((1, 10, 10, 1)).astype(np.float32)
    got = float(L.consistency_loss(jnp.asarray(y), jnp.asarray(z), 3))
    pt = y[:, :9, :9].reshape(1, 3, 3, 3, 3, 1).mean((2, 4))
    pp = z[:, :9, :9].reshape(1, 3, 3, 3, 3, 1).mean((2, 4))
    assert np.isclose(got, np.mean((pt - pp) ** 2), rtol=1e-4)


def test_feature_matching(rng):
    feats_r = [rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
               for _ in range(5)]
    feats_f = [rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
               for _ in range(5)]
    want = sum(np.mean(np.abs(a - b)) for a, b in zip(feats_r[:-1], feats_f[:-1]))
    got = float(L.feature_matching_loss(
        [jnp.asarray(a) for a in feats_r], [jnp.asarray(b) for b in feats_f]))
    assert np.isclose(got, want, rtol=1e-5)


def test_bce_with_logits(rng):
    logits = rng.standard_normal((2, 6, 6, 1)).astype(np.float32) * 3
    labels = (rng.random((2, 6, 6, 1)) > 0.5).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    want = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-4)


def test_pix2pix_losses(rng):
    d_fake = rng.standard_normal((2, 3, 3, 1)).astype(np.float32)
    d_real = rng.standard_normal((2, 3, 3, 1)).astype(np.float32)
    gen = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    tgt = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    total, gan, l1 = L.pix2pix_generator_loss(
        jnp.asarray(d_fake), jnp.asarray(gen), jnp.asarray(tgt), 100.0)
    assert np.isclose(float(l1), np.abs(tgt - gen).mean(), rtol=1e-5)
    assert np.isclose(float(total), float(gan) + 100 * float(l1), rtol=1e-5)
    d = float(L.pix2pix_discriminator_loss(jnp.asarray(d_real),
                                           jnp.asarray(d_fake)))
    want = (float(L.bce_with_logits(jnp.asarray(d_real),
                                    jnp.ones_like(jnp.asarray(d_real))))
            + float(L.bce_with_logits(jnp.asarray(d_fake),
                                      jnp.zeros_like(jnp.asarray(d_fake)))))
    assert np.isclose(d, want, rtol=1e-5)


def test_vgg_loss_properties(rng):
    """Without pretrained weights the VGG loss is still a deterministic
    multi-scale metric: zero for identical inputs, positive otherwise."""
    from moonsuperresolution_tpu.models import vgg as V

    params = V.init_vgg_params(seed=0)
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    la = float(V.vgg_feature_matching_loss(params, V.repeat3(a), V.repeat3(a)))
    lb = float(V.vgg_feature_matching_loss(params, V.repeat3(a), V.repeat3(b)))
    assert abs(la) < 1e-6
    assert lb > 0


def test_vgg_preprocess():
    from moonsuperresolution_tpu.models.vgg import vgg_preprocess

    x = jnp.asarray(np.full((1, 2, 2, 3), 0.0, np.float32))  # mid-gray
    out = np.asarray(vgg_preprocess(x))
    want = 127.5 - np.array([103.939, 116.779, 123.68])
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)
