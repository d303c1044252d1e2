"""VGG19 perceptual-feature extractor for the VGG feature-matching loss.

The reference instantiates Keras' imagenet-pretrained VGG19 and compares MAE
over the five block{i}_conv1 activations with weights (1/32, 1/16, 1/8, 1/4,
1) after caffe-style preprocessing (reference: spade/losses.py:56-80).

This module reimplements the feature extractor in flax.  Pretrained weights
are loaded from a Keras .h5 file when available (``load_keras_vgg19_weights``)
— this environment has no network egress, so weight download is not assumed.
Without pretrained weights a fixed-seed random initialization is used; a
random multi-scale conv pyramid is still a valid (if weaker) perceptual
metric, and all unit tests pin the seed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from moonsuperresolution_tpu.losses import mae_loss

# (convs per block, channels per block) for VGG19's feature trunk.
_BLOCKS = ((2, 64), (2, 128), (4, 256), (4, 512), (4, 512))
FEATURE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)
# Caffe-mode BGR channel means used by keras.applications.vgg19.preprocess_input.
_BGR_MEANS = np.array([103.939, 116.779, 123.68], dtype=np.float32)


def vgg_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Map [-1, 1]-scaled RGB to caffe-preprocessed BGR, exactly as the
    reference does before the VGG forward (losses.py:72-74)."""
    x = 127.5 * (x + 1.0)
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(_BGR_MEANS)


class VGG19Features(nn.Module):
    """Returns the five block{i}_conv1 activations (post-ReLU)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        for b, (n_convs, ch) in enumerate(_BLOCKS):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"block{b + 1}_conv{c + 1}")(x)
                x = nn.relu(x)
                if c == 0:
                    feats.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def init_vgg_params(seed: int = 0, dtype=jnp.float32):
    """Fixed-seed random init (fallback when no pretrained weights exist)."""
    model = VGG19Features()
    dummy = jnp.zeros((1, 64, 64, 3), dtype)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


def load_keras_vgg19_weights(h5_path: str):
    """Convert a Keras VGG19 ``.h5`` weight file (as distributed for
    keras.applications.VGG19(include_top=False)) into flax params."""
    import h5py

    params = {}
    with h5py.File(h5_path, "r") as f:
        grp = f["model_weights"] if "model_weights" in f else f
        for b, (n_convs, _ch) in enumerate(_BLOCKS):
            for c in range(n_convs):
                name = f"block{b + 1}_conv{c + 1}"
                layer = grp[name]
                # Keras nests weights one level deeper under the layer name.
                inner = layer[name] if name in layer else layer
                kernel = np.array(inner["kernel:0"])
                bias = np.array(inner["bias:0"])
                params[name] = {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(bias)}
    return params


def save_vgg19_npz(params, npz_path: str) -> None:
    """Save flax VGG19 params as a flat npz (layer/kernel, layer/bias)."""
    flat = {}
    for name, p in params.items():
        flat[f"{name}/kernel"] = np.asarray(p["kernel"])
        flat[f"{name}/bias"] = np.asarray(p["bias"])
    np.savez(npz_path, **flat)


def load_vgg19_npz(npz_path: str):
    """Load params written by :func:`save_vgg19_npz`."""
    with np.load(npz_path) as f:
        params = {}
        for b, (n_convs, ch) in enumerate(_BLOCKS):
            for c in range(n_convs):
                name = f"block{b + 1}_conv{c + 1}"
                kernel = f[f"{name}/kernel"]
                if kernel.shape[-1] != ch:
                    raise ValueError(
                        f"{name}: expected {ch} output channels, "
                        f"got {kernel.shape}")
                params[name] = {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(f[f"{name}/bias"])}
    return params


def load_vgg19_params(path: str):
    """Load pretrained VGG19 params from either a Keras ``.h5`` weight file
    or a converted ``.npz`` (cli/convert_vgg.py)."""
    if path.endswith(".npz"):
        return load_vgg19_npz(path)
    return load_keras_vgg19_weights(path)


def vgg_feature_matching_loss(params, y_true: jnp.ndarray,
                              y_pred: jnp.ndarray) -> jnp.ndarray:
    """Weighted MAE over VGG19 features of caffe-preprocessed inputs
    (reference: losses.py:76-80).  Inputs are 3-channel, roughly [-1, 1]
    scaled (the reference feeds [-0.5, 0.5] DEMs repeated to 3 channels)."""
    model = VGG19Features()
    rf = model.apply({"params": params}, vgg_preprocess(y_true))
    ff = model.apply({"params": params}, vgg_preprocess(y_pred))
    loss = 0.0
    for w, a, b in zip(FEATURE_WEIGHTS, rf, ff):
        loss = loss + w * mae_loss(a, b)
    return loss


def repeat3(x: jnp.ndarray) -> jnp.ndarray:
    """1-channel -> 3-channel (the reference's tf.repeat(target, 3, -1))."""
    return jnp.repeat(x, 3, axis=-1)
