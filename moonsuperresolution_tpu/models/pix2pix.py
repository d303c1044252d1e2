"""pix2pix U-Net generator and PatchGAN discriminator (reference: pix2pix.py).

256x256, 2-channel (ortho + low-res DEM) -> 1-channel DEM residual, tanh head.
Matches the reference architecture derived from the TF pix2pix tutorial:

- generator (pix2pix.py:88-108): 8 downsample blocks (64,128,256,512x5) /
  7 upsample blocks (512x3 with dropout, 512, 256, 128, 64) with skip
  concatenations, final 4x4 stride-2 transpose conv with tanh.
- discriminator (pix2pix.py:118-135): 3 downsample blocks, zero-pad, 4x4
  VALID conv(512) + BN + LeakyReLU, zero-pad, 4x4 VALID conv(1) -> 30x30
  logit map.

The reference always runs BatchNorm in training mode (training=True even in
val/test, pix2pix.py:146-148,165-167), so BatchNorm here is *stateless*:
it always normalizes with current batch statistics (Keras eps 1e-3).
Dropout likewise stays active whenever a dropout rng is provided.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

conv_init = nn.initializers.normal(stddev=0.02)


class BatchStatNorm(nn.Module):
    """BatchNorm that always uses current-batch statistics (the only mode the
    reference ever exercises)."""

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        x_hat = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        gamma = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x_hat * gamma + beta


class Down(nn.Module):
    filters: int
    size: int = 4
    apply_batchnorm: bool = True
    alpha: float = 0.3  # Keras LeakyReLU default, used by the reference

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.filters, (self.size, self.size), strides=(2, 2),
                    padding="SAME", use_bias=False, kernel_init=conv_init,
                    name="conv")(x)
        if self.apply_batchnorm:
            x = BatchStatNorm(name="bn")(x)
        return nn.leaky_relu(x, negative_slope=self.alpha)


class Up(nn.Module):
    filters: int
    size: int = 4
    apply_dropout: bool = False
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # transpose_kernel=True uses the Keras Conv2DTranspose kernel layout
        # (kh, kw, out, in) and gradient-of-conv semantics — checkpoint
        # import needs no kernel munging (see tests/test_tf_parity.py).
        x = nn.ConvTranspose(self.filters, (self.size, self.size),
                             strides=(2, 2), padding="SAME", use_bias=False,
                             kernel_init=conv_init, transpose_kernel=True,
                             name="deconv")(x)
        x = BatchStatNorm(name="bn")(x)
        if self.apply_dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.relu(x)


class Pix2PixGenerator(nn.Module):
    output_channels: int = 1
    # depth 8 bottlenecks a 256 input to 1x1 (the reference architecture,
    # pix2pix.py:10-19); smaller depths keep the same channel pattern and are
    # used for fast CPU tests.
    depth: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        full_channels = (64, 128, 256, 512, 512, 512, 512, 512)
        down_plan = [(f, i > 0) for i, f in enumerate(full_channels[: self.depth])]
        # Up block i mirrors down block depth-2-i; the deepest three carry
        # dropout (pix2pix.py:20-28).
        up_plan = [
            (full_channels[self.depth - 2 - i], i < 3)
            for i in range(self.depth - 1)
        ]
        skips = []
        for i, (f, bn) in enumerate(down_plan):
            x = Down(f, apply_batchnorm=bn, name=f"down_{i}")(x)
            skips.append(x)
        skips = list(reversed(skips[:-1]))
        for i, ((f, do), skip) in enumerate(zip(up_plan, skips)):
            x = Up(f, apply_dropout=do, name=f"up_{i}")(x, deterministic)
            x = jnp.concatenate([x, skip], axis=-1)
        x = nn.ConvTranspose(self.output_channels, (4, 4), strides=(2, 2),
                             padding="SAME", kernel_init=conv_init,
                             transpose_kernel=True, name="head")(x)
        return jnp.tanh(x)


class Pix2PixDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([source, target], axis=-1)
        x = Down(64, apply_batchnorm=False, name="down_0")(x)
        x = Down(128, name="down_1")(x)
        x = Down(256, name="down_2")(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.Conv(512, (4, 4), strides=(1, 1), padding="VALID",
                    use_bias=False, kernel_init=conv_init, name="conv")(x)
        x = BatchStatNorm(name="bn")(x)
        x = nn.leaky_relu(x, negative_slope=0.3)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID",
                    kernel_init=conv_init, name="head")(x)
        return x
