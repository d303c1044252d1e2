"""Loss library for the DEM super-resolution model family.

Reimplements every loss in the reference's spade/losses.py (and
pix2pix.py:110-141) as pure JAX functions over NHWC arrays.  All reductions
follow the Keras conventions the reference relies on (global mean for
MSE/MAE/Hinge; *sum* for the KL term, spade/losses.py:8-9).
"""

from __future__ import annotations

import jax.numpy as jnp

from moonsuperresolution_tpu.ops.gradients import image_gradients
from moonsuperresolution_tpu.ops.resize import area_downscale


def generator_hinge_loss(disc_logits: jnp.ndarray) -> jnp.ndarray:
    """Hinge generator loss: ``-mean(D(fake))`` (spade/losses.py:5-6)."""
    return -jnp.mean(disc_logits)


def discriminator_hinge_loss(disc_logits: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """Keras Hinge with +/-1 labels (spade/losses.py:83-90):
    ``mean(max(1 - label * y, 0))``."""
    label = 1.0 if is_real else -1.0
    return jnp.mean(jnp.maximum(1.0 - label * disc_logits, 0.0))


def kl_divergence_loss(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mean, exp(logvar)) || N(0,1)), summed over batch and latent —
    the reference uses reduce_sum, not mean (spade/losses.py:8-9)."""
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mean) - jnp.exp(logvar))


def gradient_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """L1 on forward-difference image gradients (spade/losses.py:11-14)."""
    gy_t, gx_t = image_gradients(y_true)
    gy_p, gx_p = image_gradients(y_pred)
    return jnp.mean(jnp.abs(gx_t - gx_p) + jnp.abs(gy_t - gy_p))


def normal_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Surface-normal cosine loss built from image gradients
    (spade/losses.py:16-23): normals n = (-gx, -gy, 1), loss = mean(1 - cos)."""
    gy_t, gx_t = image_gradients(y_true)
    gy_p, gx_p = image_gradients(y_pred)
    one = jnp.ones_like(gx_t)
    n_t = jnp.concatenate([-gx_t, -gy_t, one], axis=-1)
    n_p = jnp.concatenate([-gx_p, -gy_p, one], axis=-1)
    dot = jnp.sum(n_p * n_t, axis=-1)
    denom = jnp.sqrt(jnp.sum(n_t * n_t, axis=-1)) * jnp.sqrt(
        jnp.sum(n_p * n_p, axis=-1)
    )
    return jnp.mean(1.0 - dot / denom)


def consistency_loss(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, upscaling: int = 16
) -> jnp.ndarray:
    """MSE between box-averaged (factor ``upscaling``) prediction and target
    (spade/losses.py:25-33).  The reference's AveragePooling2D with
    pool=stride=upscaling and valid padding equals an integer-factor area
    downscale when the size divides; otherwise we crop to the valid region
    first, matching 'valid' pooling."""
    b, h, w, c = y_true.shape
    hh = (h // upscaling) * upscaling
    ww = (w // upscaling) * upscaling
    yt = area_downscale(y_true[:, :hh, :ww, :], upscaling)
    yp = area_downscale(y_pred[:, :hh, :ww, :], upscaling)
    return jnp.mean(jnp.square(yt - yp))


def mse_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE (spade/losses.py:35-41)."""
    return jnp.mean(jnp.square(y_true - y_pred))


def mae_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(y_true - y_pred))


def feature_matching_loss(real_feats, fake_feats) -> jnp.ndarray:
    """Sum of MAE over all discriminator feature maps except the final logits
    (spade/losses.py:44-53)."""
    loss = 0.0
    for rf, ff in zip(real_feats[:-1], fake_feats[:-1]):
        loss = loss + mae_loss(rf, ff)
    return loss


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy from logits, mean-reduced — the pix2pix
    adversarial loss (pix2pix.py:33, 110-115, 137-141)."""
    # log(1 + exp(-|x|)) + max(x, 0) - x*z  (numerically stable)
    neg_abs = -jnp.abs(logits)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(neg_abs))
    )


def pix2pix_generator_loss(
    disc_fake_logits: jnp.ndarray,
    gen_output: jnp.ndarray,
    target: jnp.ndarray,
    l1_lambda: float = 100.0,
):
    """pix2pix: BCE(ones, D(fake)) + lambda * L1 (pix2pix.py:110-115)."""
    gan = bce_with_logits(disc_fake_logits, jnp.ones_like(disc_fake_logits))
    l1 = mae_loss(target, gen_output)
    return gan + l1_lambda * l1, gan, l1


def pix2pix_discriminator_loss(
    disc_real_logits: jnp.ndarray, disc_fake_logits: jnp.ndarray
) -> jnp.ndarray:
    """pix2pix: BCE(ones, D(real)) + BCE(zeros, D(fake)) (pix2pix.py:137-141)."""
    real = bce_with_logits(disc_real_logits, jnp.ones_like(disc_real_logits))
    fake = bce_with_logits(disc_fake_logits, jnp.zeros_like(disc_fake_logits))
    return real + fake
