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


def test_vgg_npz_roundtrip(tmp_path):
    """save_vgg19_npz -> load_vgg19_params reproduces params and features."""
    from moonsuperresolution_tpu.models import vgg as V

    params = V.init_vgg_params(seed=3)
    p = str(tmp_path / "vgg19.npz")
    V.save_vgg19_npz(params, p)
    loaded = V.load_vgg19_params(p)
    for name, lp in params.items():
        np.testing.assert_array_equal(np.asarray(lp["kernel"]),
                                      np.asarray(loaded[name]["kernel"]))
    x = jnp.asarray(np.linspace(-1, 1, 1 * 32 * 32 * 3, dtype=np.float32)
                    .reshape(1, 32, 32, 3))
    la = float(V.vgg_feature_matching_loss(params, x, 0.5 * x))
    lb = float(V.vgg_feature_matching_loss(loaded, x, 0.5 * x))
    assert np.isclose(la, lb, rtol=1e-6)


def test_convert_torch_vgg19(tmp_path):
    """The torchvision-layout converter maps features.N OIHW tensors onto the
    right flax layers with HWIO transposition (cli/convert_vgg.py)."""
    torch = pytest.importorskip("torch")
    from moonsuperresolution_tpu.cli.convert_vgg import convert_torch_vgg19
    from moonsuperresolution_tpu.models.vgg import _BLOCKS

    rng = np.random.default_rng(0)
    sd, idx, cin = {}, 0, 3
    for b, (n_convs, ch) in enumerate(_BLOCKS):
        for _c in range(n_convs):
            sd[f"features.{idx}.weight"] = torch.from_numpy(
                rng.standard_normal((ch, cin, 3, 3)).astype(np.float32))
            sd[f"features.{idx}.bias"] = torch.from_numpy(
                rng.standard_normal((ch,)).astype(np.float32))
            idx += 2
            cin = ch
        idx += 1
    p = str(tmp_path / "vgg19.pth")
    torch.save(sd, p)
    params = convert_torch_vgg19(p)
    assert params["block1_conv1"]["kernel"].shape == (3, 3, 3, 64)
    assert params["block5_conv4"]["kernel"].shape == (3, 3, 512, 512)
    np.testing.assert_allclose(
        params["block1_conv1"]["kernel"],
        np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0)))


def test_trainer_warns_on_random_vgg():
    """Random-VGG fallback must be loud at first perceptual-loss access, and
    silent for inference-only construction (VERDICT r3)."""
    import warnings

    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    cfg = TrainConfig(model=ModelConfig(variant="cnn_spade", image_size=64,
                                        latent_dim=16), batch_size=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # construction must NOT warn
        tr = GauGANTrainer(cfg)
    with pytest.warns(UserWarning, match="RANDOM conv features"):
        _ = tr.vgg_params
