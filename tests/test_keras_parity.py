"""Full-network numeric parity against live Keras models.

Builds the reference architectures in Keras (mirroring spade/models/*.py
semantics), imports their freshly-initialized weights through the
utils.checkpoint conversion path, and asserts our flax forward reproduces the
Keras forward on the same inputs.  This validates the whole fidelity bridge:
layer semantics (SPADE batch moments, SAME padding, instance-norm epsilon),
weight layouts, and the creation-order contract the importer relies on.

Slow (builds real Keras models); skipped automatically when TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
keras = tf.keras

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from moonsuperresolution_tpu.models.networks import (  # noqa: E402
    Encoder,
    SpadeGenerator,
    SpadeDiscriminator,
)
from moonsuperresolution_tpu.utils.checkpoint import (  # noqa: E402
    _keras_ordered_weights,
    discriminator_params_from_weights,
    encoder_params_from_weights,
    generator_params_from_weights,
)

IMG = 64
LATENT = 16


# --- Keras builders mirroring the reference (networks.py:8-76) -------------


class KSpade(keras.layers.Layer):
    """spade/models/spade.py:5-25 semantics."""

    def __init__(self, filters, **kw):
        super().__init__(**kw)
        self.conv = keras.layers.Conv2D(128, 3, padding="same",
                                        activation="relu")
        self.conv_gamma = keras.layers.Conv2D(filters, 3, padding="same")
        self.conv_beta = keras.layers.Conv2D(filters, 3, padding="same")

    def call(self, x, mask):
        mask = tf.image.resize(mask, x.shape[1:3], method="nearest")
        h = self.conv(mask)
        gamma = self.conv_gamma(h)
        beta = self.conv_beta(h)
        mean, var = tf.nn.moments(x, axes=(0, 1, 2), keepdims=True)
        return gamma * (x - mean) / tf.sqrt(var + 1e-5) + beta


class KResBlock(keras.layers.Layer):
    """spade/models/blocks.py:9-38 semantics (creation order matters for the
    importer: spade_1, spade_2, conv_1, conv_2, [spade_3, conv_3])."""

    def __init__(self, filters, **kw):
        super().__init__(**kw)
        self.filters = filters

    def build(self, shape):
        in_f = shape[-1]
        self.spade_1 = KSpade(in_f)
        self.spade_2 = KSpade(self.filters)
        self.conv_1 = keras.layers.Conv2D(self.filters, 3, padding="same")
        self.conv_2 = keras.layers.Conv2D(self.filters, 3, padding="same")
        self.skip = self.filters != in_f
        if self.skip:
            self.spade_3 = KSpade(in_f)
            self.conv_3 = keras.layers.Conv2D(self.filters, 3, padding="same")

    def call(self, x, mask):
        h = self.spade_1(x, mask)
        h = self.conv_1(tf.nn.leaky_relu(h, 0.2))
        h = self.spade_2(h, mask)
        h = self.conv_2(tf.nn.leaky_relu(h, 0.2))
        if self.skip:
            s = self.conv_3(tf.nn.leaky_relu(self.spade_3(x, mask), 0.2))
        else:
            s = x
        return s + h


def k_downsample(ch, kernel, strides=2, norm=True):
    """blocks.py:41-68: strided conv (no bias) + instance norm + LeakyReLU."""
    block = keras.Sequential()
    block.add(keras.layers.Conv2D(ch, kernel, strides=strides, padding="same",
                                  use_bias=False))
    if norm:
        block.add(keras.layers.GroupNormalization(groups=-1, epsilon=1e-3))
    block.add(keras.layers.LeakyReLU(negative_slope=0.2))
    return block


def build_keras_encoder():
    """networks.py:8-34."""
    inp = keras.Input((IMG, IMG, 2))
    x = k_downsample(64, 3, norm=False)(inp)
    x = k_downsample(128, 3)(x)
    x = k_downsample(256, 3)(x)
    x = k_downsample(512, 3)(x)
    x = k_downsample(512, 3)(x)
    x = keras.layers.Flatten()(x)
    mean = keras.layers.Dense(LATENT, name="mean")(x)
    var = keras.layers.Dense(LATENT, name="variance")(x)
    return keras.Model(inp, [mean, var])


def build_keras_generator():
    """networks.py:37-57 (sw = IMG/64 = 1)."""
    sw = IMG // 64
    latent = keras.Input((LATENT,))
    source = keras.Input((IMG, IMG, 2))
    x = keras.layers.Dense(16 * sw * sw * 64)(latent)
    x = keras.layers.Reshape((sw, sw, 1024))(x)
    for ch in (1024, 1024, 1024, 512, 256, 128):
        x = KResBlock(ch)(x, source)
        x = keras.layers.UpSampling2D((2, 2))(x)
    x = keras.layers.LeakyReLU(negative_slope=0.2)(x)
    out = keras.layers.Conv2D(1, 4, padding="same")(x)
    return keras.Model([latent, source], out)


def build_keras_discriminator():
    """networks.py:60-76."""
    a = keras.Input((IMG, IMG, 2))
    b = keras.Input((IMG, IMG, 1))
    x = keras.layers.Concatenate()([a, b])
    x1 = k_downsample(64, 4, norm=False)(x)
    x2 = k_downsample(128, 4)(x1)
    x3 = k_downsample(256, 4)(x2)
    x4 = k_downsample(512, 4, strides=1)(x3)
    x5 = keras.layers.Conv2D(1, 4)(x4)
    return keras.Model([a, b], [x1, x2, x3, x4, x5])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((2, IMG, IMG, 2)).astype(np.float32) * 0.3
    tgt = rng.standard_normal((2, IMG, IMG, 1)).astype(np.float32) * 0.3
    z = rng.standard_normal((2, LATENT)).astype(np.float32)
    return src, tgt, z


def test_encoder_parity(data):
    src, _, _ = data
    km = build_keras_encoder()
    k_mean, k_var = km(src)
    names, values = _keras_ordered_weights(km)
    params = encoder_params_from_weights(names, values)
    enc = Encoder(latent_dim=LATENT)
    j_mean, j_var = enc.apply({"params": params}, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(j_mean), k_mean.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_var), k_var.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_generator_parity(data):
    src, _, z = data
    km = build_keras_generator()
    k_out = km([z, src]).numpy()
    names, values = _keras_ordered_weights(km)
    params = generator_params_from_weights(names, values)
    gen = SpadeGenerator(image_size=IMG)
    j_out = np.asarray(gen.apply({"params": params}, jnp.asarray(z),
                                 jnp.asarray(src)))
    np.testing.assert_allclose(j_out, k_out, rtol=2e-3, atol=2e-3)


def test_discriminator_parity(data):
    src, tgt, _ = data
    km = build_keras_discriminator()
    k_feats = [f.numpy() for f in km([src, tgt])]
    names, values = _keras_ordered_weights(km)
    params = discriminator_params_from_weights(names, values)
    disc = SpadeDiscriminator()
    j_feats = disc.apply({"params": params}, jnp.asarray(src),
                         jnp.asarray(tgt))
    assert len(j_feats) == len(k_feats)
    for jf, kf in zip(j_feats, k_feats):
        np.testing.assert_allclose(np.asarray(jf), kf, rtol=1e-3, atol=1e-4)


def test_vgg19_weight_loader_and_features(tmp_path, data):
    """load_keras_vgg19_weights + VGG19Features vs a live
    keras.applications VGG19 (reference: spade/losses.py:56-80).

    Uses tf_keras (legacy Keras 2), whose ``save_weights(...h5)`` writes the
    same layer-group HDF5 layout as the distributed
    vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5 artifact — so this
    pins the loader end-to-end.  Weights are random (this environment has no
    egress to fetch the imagenet file; see scripts/fetch_vgg19_weights.md),
    which exercises the exact same code path.
    """
    tfk = pytest.importorskip("tf_keras")

    from moonsuperresolution_tpu.models.vgg import (
        VGG19Features,
        load_keras_vgg19_weights,
        vgg_preprocess,
    )

    kvgg = tfk.applications.VGG19(include_top=False, weights=None,
                                  input_shape=(IMG, IMG, 3))
    h5 = str(tmp_path / "vgg19_random.h5")
    kvgg.save_weights(h5)
    params = load_keras_vgg19_weights(h5)

    rng = np.random.default_rng(7)
    raw = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)

    # preprocessing parity: ours fuses the reference's 127.5*(x+1) rescale
    # (losses.py:72-74) with keras' caffe preprocess_input
    k_pre = tfk.applications.vgg19.preprocess_input(127.5 * (raw + 1.0))
    j_pre = np.asarray(vgg_preprocess(jnp.asarray(raw)))
    np.testing.assert_allclose(j_pre, k_pre, rtol=1e-6, atol=1e-4)

    taps = [kvgg.get_layer(f"block{i}_conv1").output for i in range(1, 6)]
    k_feats = tfk.Model(kvgg.input, taps)(k_pre)
    j_feats = VGG19Features().apply({"params": params}, jnp.asarray(j_pre))
    assert len(j_feats) == 5
    for i, (jf, kf) in enumerate(zip(j_feats, k_feats)):
        np.testing.assert_allclose(np.asarray(jf), kf.numpy(),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"block{i + 1}_conv1")


def test_no_kl_forward_parity(data):
    """GauGAN_no_KL end-to-end forward: deterministic latent z = mean +
    variance (no sampler; model.py:153-154, 178) through encoder + generator,
    driven via the trainer's _generate path so the variant dispatch itself is
    pinned, not just the networks."""
    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    src, _, _ = data
    k_enc = build_keras_encoder()
    k_gen = build_keras_generator()
    src_t = tf.convert_to_tensor(src)
    k_mean, k_var = k_enc(src_t)
    k_z = k_mean + k_var
    k_out = k_gen([k_z, src_t]).numpy()

    enc_names, enc_vals = _keras_ordered_weights(k_enc)
    gen_names, gen_vals = _keras_ordered_weights(k_gen)
    params = {
        "encoder": encoder_params_from_weights(enc_names, enc_vals),
        "generator": generator_params_from_weights(gen_names, gen_vals),
    }
    cfg = TrainConfig(
        model=ModelConfig(variant="gaugan_no_kl", image_size=IMG,
                          latent_dim=LATENT, feature_loss_coeff=5.0),
        batch_size=2,
    )
    trainer = GauGANTrainer(cfg)
    # rng must be irrelevant: the no-KL latent is deterministic.
    out_a, mean_a, logvar_a = trainer._generate(
        params, jnp.asarray(src), jax.random.PRNGKey(0))
    out_b, _, _ = trainer._generate(
        params, jnp.asarray(src), jax.random.PRNGKey(123))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(mean_a), k_mean.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_a), k_var.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_a)[..., 0], k_out[..., 0],
                               rtol=2e-3, atol=2e-3)


# --- pix2pix (pix2pix.py:64-135 semantics) ---------------------------------

P2P_DEPTH = 6  # full reference depth is 8; 6 keeps the CPU test fast
P2P_IMG = 64


def k_p2p_down(f, bn=True):
    blk = keras.Sequential()
    blk.add(keras.layers.Conv2D(f, 4, strides=2, padding="same",
                                use_bias=False))
    if bn:
        blk.add(keras.layers.BatchNormalization())
    blk.add(keras.layers.LeakyReLU(negative_slope=0.3))
    return blk


def k_p2p_up(f):
    blk = keras.Sequential()
    blk.add(keras.layers.Conv2DTranspose(f, 4, strides=2, padding="same",
                                         use_bias=False))
    blk.add(keras.layers.BatchNormalization())
    blk.add(keras.layers.ReLU())
    return blk


def build_keras_pix2pix_generator():
    """pix2pix.py:88-108 at reduced depth; dropout omitted (weightless, and
    the deterministic comparison needs it off on both sides)."""
    full = (64, 128, 256, 512, 512, 512, 512, 512)
    downs = [k_p2p_down(f, bn=i > 0)
             for i, f in enumerate(full[:P2P_DEPTH])]
    ups = [k_p2p_up(full[P2P_DEPTH - 2 - i]) for i in range(P2P_DEPTH - 1)]
    inp = keras.Input((P2P_IMG, P2P_IMG, 2))
    x = inp
    skips = []
    for d in downs:
        x = d(x)
        skips.append(x)
    skips = list(reversed(skips[:-1]))
    for u, skip in zip(ups, skips):
        x = u(x)
        x = keras.layers.Concatenate()([x, skip])
    out = keras.layers.Conv2DTranspose(1, 4, strides=2, padding="same",
                                       activation="tanh")(x)
    return keras.Model(inp, out)


def build_keras_pix2pix_discriminator():
    """pix2pix.py:118-135 (30x30 PatchGAN at 256; smaller map here)."""
    a = keras.Input((P2P_IMG, P2P_IMG, 2))
    b = keras.Input((P2P_IMG, P2P_IMG, 1))
    x = keras.layers.concatenate([a, b])
    x = k_p2p_down(64, bn=False)(x)
    x = k_p2p_down(128)(x)
    x = k_p2p_down(256)(x)
    x = keras.layers.ZeroPadding2D()(x)
    x = keras.layers.Conv2D(512, 4, strides=1, use_bias=False)(x)
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.LeakyReLU(negative_slope=0.3)(x)
    x = keras.layers.ZeroPadding2D()(x)
    out = keras.layers.Conv2D(1, 4, strides=1)(x)
    return keras.Model([a, b], out)


def test_pix2pix_generator_parity(data):
    from moonsuperresolution_tpu.models.pix2pix import Pix2PixGenerator
    from moonsuperresolution_tpu.utils.checkpoint import (
        pix2pix_generator_params_from_weights,
    )

    src, _, _ = data
    km = build_keras_pix2pix_generator()
    k_out = km(src, training=True).numpy()  # batch-stat BN, reference mode
    names, values = _keras_ordered_weights(km)
    params = pix2pix_generator_params_from_weights(names, values,
                                                   depth=P2P_DEPTH)
    gen = Pix2PixGenerator(depth=P2P_DEPTH)
    j_out = np.asarray(gen.apply({"params": params}, jnp.asarray(src), True))
    np.testing.assert_allclose(j_out, k_out, rtol=1e-3, atol=1e-4)


def test_pix2pix_discriminator_parity(data):
    from moonsuperresolution_tpu.models.pix2pix import Pix2PixDiscriminator
    from moonsuperresolution_tpu.utils.checkpoint import (
        pix2pix_discriminator_params_from_weights,
    )

    src, tgt, _ = data
    km = build_keras_pix2pix_discriminator()
    k_out = km([src, tgt], training=True).numpy()
    names, values = _keras_ordered_weights(km)
    params = pix2pix_discriminator_params_from_weights(names, values)
    disc = Pix2PixDiscriminator()
    j_out = np.asarray(disc.apply({"params": params}, jnp.asarray(src),
                                  jnp.asarray(tgt)))
    np.testing.assert_allclose(j_out, k_out, rtol=1e-3, atol=1e-4)


def test_savedmodel_directory_import(data, tmp_path):
    """The full checkpoint path: Keras model -> SavedModel directory ->
    _savedmodel_ordered_weights -> our params -> matching forward.  Validates
    that tf.saved_model.load's variable order preserves creation order (the
    importer's contract)."""
    from moonsuperresolution_tpu.utils.checkpoint import (
        _savedmodel_ordered_weights,
        encoder_params_from_weights,
    )

    src, _, _ = data
    km = build_keras_encoder()
    k_mean, k_var = km(src)
    sm_dir = str(tmp_path / "encoder")
    km.export(sm_dir)
    names, values = _savedmodel_ordered_weights(sm_dir)
    params = encoder_params_from_weights(names, values)
    enc = Encoder(latent_dim=LATENT)
    j_mean, j_var = enc.apply({"params": params}, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(j_mean), k_mean.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_var), k_var.numpy(),
                               rtol=1e-3, atol=1e-4)
