"""The three SPADE-family networks (reference: spade/models/networks.py).

- ``Encoder``           : VAE encoder, 5 downsample blocks -> (mean, logvar)
                          heads (networks.py:8-34)
- ``SpadeGenerator``    : latent -> Dense -> 6x [SPADE resblock + 2x nearest
                          upsample] -> 4x4 conv head (networks.py:37-57)
- ``SpadeDiscriminator``: multi-scale PatchGAN returning all intermediate
                          feature maps for feature matching (networks.py:60-76)

Design notes for TPU: all spatial ops are static-shape NHWC convs that XLA
tiles onto the MXU; the 2x upsample is a reshape-broadcast (nearest), which
fuses into the following conv's input.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from moonsuperresolution_tpu.models.layers import (
    DownsampleBlock,
    SpadeResidualBlock,
    _ConvParams,
    glorot_uniform,
    leaky_relu,
)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Keras UpSampling2D (nearest) as a reshape-broadcast — no gather."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def collapse_head_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Fold a 4x4 HWIO kernel over a 2x-nearest-upsampled input into four
    3x3 phase kernels over the PRE-upsample input: [4,4,C,O] -> [3,3,C,4*O].

    Because nearest upsampling duplicates each coarse pixel 2x2, a SAME 4x4
    conv at fine resolution reads each output phase (di,dj) from at most 3x3
    coarse pixels; summing the fine taps that land on the same coarse pixel
    gives an exactly equivalent 3x3 conv per phase (for XLA/Keras SAME
    padding of an even kernel, pad lo=1/hi=2, fine tap a maps to coarse
    offset (2i+di+a-1)//2 - i).  ``subpixel head``: the generator's final
    upsample+4x4 conv (reference networks.py:55-57) runs at QUARTER spatial
    resolution with 4x output channels + depth-to-space — the 512^2 x 128
    activation materialization disappears and the MXU sees one denser
    matmul.  Exact up to f32 tap-sum rounding (parity-tested).
    """
    c, o = k.shape[2], k.shape[3]
    # di -> ((fine tap a, coarse 3x3 index), ...); index 1 = offset 0.
    tap = {0: ((0, 0), (1, 1), (2, 1), (3, 2)),
           1: ((0, 1), (1, 1), (2, 2), (3, 2))}
    phases = []
    for di in (0, 1):
        for dj in (0, 1):
            acc = jnp.zeros((3, 3, c, o), k.dtype)
            for ay, by in tap[di]:
                for ax, bx in tap[dj]:
                    acc = acc.at[by, bx].add(k[ay, ax])
            phases.append(acc)
    return jnp.concatenate(phases, axis=-1)


def depth_to_space2x(x: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    """[B,H,W,4*O] phase-major channels -> [B,2H,2W,O]."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, out_ch)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, out_ch)


def subpixel_head_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """Equivalent of ``conv4x4_SAME(upsample2x_nearest(x), kernel) + bias``
    computed at pre-upsample resolution (see collapse_head_kernel)."""
    import jax

    kc = collapse_head_kernel(kernel)
    dn = jax.lax.conv_dimension_numbers(x.shape, kc.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kc, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return depth_to_space2x(y, kernel.shape[-1]) + bias


class Encoder(nn.Module):
    """VAE encoder: downsample stack (64,128,256,512,512; first block without
    norm) -> flatten -> Dense mean / Dense logvar (networks.py:8-34).

    The reference names the second head "variance" but uses it as a
    log-variance everywhere (sampling.py:16 exp(0.5*v), losses.py:8-9 exp(v));
    we call it ``logvar``.
    """

    latent_dim: int = 256
    downsample_factor: int = 64
    alpha: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        f = self.downsample_factor
        d = self.dtype
        x = DownsampleBlock(f, 3, apply_norm=False, alpha=self.alpha,
                            dtype=d, name="down_0")(x)
        x = DownsampleBlock(2 * f, 3, alpha=self.alpha, dtype=d, name="down_1")(x)
        x = DownsampleBlock(4 * f, 3, alpha=self.alpha, dtype=d, name="down_2")(x)
        x = DownsampleBlock(8 * f, 3, alpha=self.alpha, dtype=d, name="down_3")(x)
        x = DownsampleBlock(8 * f, 3, alpha=self.alpha, dtype=d, name="down_4")(x)
        x = x.reshape(x.shape[0], -1)
        mean = nn.Dense(self.latent_dim, kernel_init=glorot_uniform,
                        dtype=d, name="mean")(x)
        logvar = nn.Dense(self.latent_dim, kernel_init=glorot_uniform,
                          dtype=d, name="variance")(x)
        # Latent heads in float32: they feed the KL term and exp().
        return mean.astype(jnp.float32), logvar.astype(jnp.float32)


class SpadeGenerator(nn.Module):
    """SPADE generator (networks.py:37-57).

    latent [B, latent_dim] -> Dense(1024*sw*sw) -> [B, sw, sw, 1024] with
    sw = image_size / 64, then six SPADE residual blocks with channel plan
    (1024, 1024, 1024, 512, 256, 128), each followed by a 2x nearest
    upsample; final LeakyReLU(0.2) + 4x4 conv to one channel.  The
    conditioning map (ortho + low-res DEM) is injected into every resblock.
    """

    image_size: int
    alpha: float = 0.2
    stats: str = "batch"
    channel_plan: tuple = (1024, 1024, 1024, 512, 256, 128)
    dtype: Any = jnp.float32
    stats_dtype: Any = jnp.float32
    # See layers.SPADE.fuse_gb: True for single-chip speed, False on TP
    # meshes (keeps the step HLO collective-permute-free).
    fuse_spade_gb: bool = True
    # Compute the final upsample + 4x4 head conv as an exactly-equivalent
    # subpixel conv at pre-upsample resolution (collapse_head_kernel): the
    # full-resolution 128-channel activation never materializes in HBM.
    # Param tree is identical either way (checkpoints interchange freely).
    subpixel_head: bool = True

    @nn.compact
    def __call__(self, latent: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        sw = self.image_size // 2**6
        if sw < 1:
            raise ValueError(f"image_size {self.image_size} too small (needs >= 64)")
        # Reference: Dense(16*sw*sw*64) reshaped to (sw, sw, 1024)
        # (networks.py:44-46); with a custom channel plan the initial width
        # follows plan[0].
        c0 = self.channel_plan[0]
        x = nn.Dense(sw * sw * c0, kernel_init=glorot_uniform,
                     dtype=self.dtype, name="dense")(latent.astype(self.dtype))
        x = x.reshape(-1, sw, sw, c0)
        sdt = (jnp.bfloat16 if self.stats_dtype in ("bfloat16", jnp.bfloat16)
               else jnp.float32)
        from moonsuperresolution_tpu.models.layers import spade_moments

        x_hat_up = None
        n_blocks = len(self.channel_plan)
        for i, ch in enumerate(self.channel_plan):
            x = SpadeResidualBlock(ch, alpha=self.alpha, stats=self.stats,
                                   dtype=self.dtype,
                                   stats_dtype=self.stats_dtype,
                                   fuse_gb=self.fuse_spade_gb,
                                   name=f"resblock_{i}")(
                x, source, input_normalized=x_hat_up)
            if i + 1 == n_blocks and self.subpixel_head:
                # The head runs at pre-upsample resolution (below); the
                # normalized tensor would be dead code.
                break
            # 2x nearest upsampling duplicates every element 4x, so the next
            # block's SPADE moments AND normalized input equal the upsampled
            # pre-upsample results — compute both BEFORE upsampling (4x less
            # reduction + normalization traffic; stat reductions alone were
            # 18% of inference time in the tile-program trace).
            # Mathematically identical (summing N elements instead of 4N
            # changes f32 accumulation order, so results agree to ulps, not
            # bits — parity tests use float tolerances accordingly).
            xs = x.astype(sdt)
            mean, var = spade_moments(xs, self.stats)
            x_hat = (xs - mean) * jnp.reciprocal(jnp.sqrt(var + 1e-5))
            # Cast to compute dtype BEFORE upsampling: SPADE's consumer
            # casts ``normalized`` to dtype anyway, so this is bitwise
            # identical — and the upsampled tensor is written/read at half
            # the bytes when stats run in f32 over bf16 compute.
            x_hat_up = upsample2x_nearest(x_hat.astype(self.dtype))
            x = upsample2x_nearest(x)
        if self.subpixel_head:
            # leaky_relu commutes with nearest upsampling (elementwise), so
            # activation + head both run at quarter resolution; the phase
            # conv + depth-to-space is exactly the reference's
            # UpSampling2D -> LeakyReLU -> Conv2D(1, 4) (networks.py:55-57).
            k_head, b_head = _ConvParams(1, self.channel_plan[-1], kernel=4,
                                         name="head")()
            x = subpixel_head_conv(leaky_relu(x, 0.2),
                                   k_head.astype(self.dtype),
                                   b_head.astype(self.dtype))
        else:
            x = leaky_relu(x, 0.2)
            x = nn.Conv(1, (4, 4), padding="SAME", kernel_init=glorot_uniform,
                        dtype=self.dtype, name="head")(x)
        # DEM output in float32 for the loss/denormalization math.
        return x.astype(jnp.float32)


class SpadeDiscriminator(nn.Module):
    """Multi-scale PatchGAN discriminator (networks.py:60-76).

    Concatenates source (2ch) and target (1ch), runs four downsample blocks
    (64, 128, 256 at stride 2; 512 at stride 1) and a final 4x4 VALID conv to
    one logit map.  Returns all five intermediate maps [x1..x5]; the last is
    the adversarial logit map, the rest feed the feature-matching loss.
    """

    downsample_factor: int = 64
    alpha: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: jnp.ndarray, target: jnp.ndarray):
        f = self.downsample_factor
        d = self.dtype
        x = jnp.concatenate([source, target], axis=-1)
        x1 = DownsampleBlock(f, 4, apply_norm=False, alpha=self.alpha,
                             dtype=d, name="down_0")(x)
        x2 = DownsampleBlock(2 * f, 4, alpha=self.alpha, dtype=d, name="down_1")(x1)
        x3 = DownsampleBlock(4 * f, 4, alpha=self.alpha, dtype=d, name="down_2")(x2)
        x4 = DownsampleBlock(8 * f, 4, strides=1, alpha=self.alpha,
                             dtype=d, name="down_3")(x3)
        x5 = nn.Conv(1, (4, 4), padding="VALID", kernel_init=glorot_uniform,
                     dtype=d, name="head")(x4)
        # Feature-matching/hinge losses expect float32.
        return [f_.astype(jnp.float32) for f_ in [x1, x2, x3, x4, x5]]


def sample_latent(rng, mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Gaussian reparameterization z = mean + exp(0.5*logvar) * eps
    (reference: spade/models/sampling.py:5-17)."""
    import jax

    eps = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(0.5 * logvar) * eps
