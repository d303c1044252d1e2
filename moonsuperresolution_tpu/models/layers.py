"""Core layers of the SPADE model family as flax.linen modules.

Faithful TPU-native re-designs of the reference layers:
- SPADE            (reference: spade/models/spade.py:5-25)
- SpadeResidualBlock (reference: spade/models/blocks.py:9-38)
- DownsampleBlock  (reference: spade/models/blocks.py:41-68)
- InstanceNorm     (tfa.layers.InstanceNormalization used by the reference)

All tensors are NHWC.  Initializers mirror the Keras defaults the reference
relies on (glorot_uniform for plain Conv/Dense, GlorotNormal for the
downsample convs) so that converted reference checkpoints drop in.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from moonsuperresolution_tpu.ops.resize import resize_nearest

glorot_uniform = nn.initializers.glorot_uniform()
glorot_normal = nn.initializers.glorot_normal()


def leaky_relu(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=alpha)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization with learned scale and
    offset — tfa.layers.InstanceNormalization semantics (epsilon 1e-3).

    Statistics are always computed in float32 (mixed-precision safe); the
    result is cast back to ``dtype``.
    """

    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Single-pass f32 moments (fused multi-output s1/s2 reduce — ONE
        # read of x instead of jnp.mean -> jnp.var's sequential passes; the
        # encoder's InstanceNorms were ~40% of its 5.7 ms in the round-5
        # int8 trace, PROFILE.md §3).  E[x^2]-E[x]^2 cancellation is benign
        # in f32 for conv-activation ranges.
        x32 = x.astype(jnp.float32)
        n = x.shape[1] * x.shape[2]
        s1 = jnp.sum(x32, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        r = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        gamma = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if self.dtype == jnp.bfloat16:
            # Inference compute mode: normalize in bf16 arithmetic so the
            # pass reads/writes 2-byte elements and fuses with the block's
            # LeakyReLU; mean/r are per-channel scalars rounded once.
            x_hat = (x - mean.astype(self.dtype)) * r.astype(self.dtype)
            return x_hat * gamma.astype(self.dtype) + beta.astype(self.dtype)
        x_hat = (x32 - mean) * r
        return (x_hat * gamma + beta).astype(self.dtype)


def spade_moments(xs: jnp.ndarray, stats: str = "batch"):
    """SPADE normalization moments of ``xs`` (already in stats dtype).

    Single-pass: sum and sum-of-squares fuse into ONE read of the
    activation tensor (multi-output reduction) instead of jnp.mean ->
    jnp.var's two sequential passes — the SPADE stack is HBM-bound.  f32
    E[x^2]-E[x]^2 cancellation stays well inside the 1e-3 Keras-parity
    tolerance for conv activations.
    """
    import os

    axes = (0, 1, 2) if stats == "batch" else (1, 2)
    n = 1.0
    for a in axes:
        n *= xs.shape[a]
    if stats == "batch" and xs.ndim == 4 and os.environ.get(
            "MOONSR_DOT_MOMENTS", "1") == "1":
        # Reduce via ones-matmul: the MXU streams the tensor at memory
        # speed where the in-graph VPU reduce ran ~3x below it (trace);
        # +3 patches/s end-to-end.  MOONSR_DOT_MOMENTS=0 restores the
        # plain reduce.
        #
        # SPMD-critical: the contraction is BATCHED over axis 0 so the
        # sharded batch dimension survives the reshape ([B,H,W,C] ->
        # [B,HW,C] keeps axis 0; a flat [B*H*W,C] reshape collapses it
        # and forces GSPMD to reshard with all-to-alls — the round-2
        # multi-chip gate failure).  The per-sample partials [B,1,C] are
        # tiny; their sum over B lowers to a cheap all-reduce under DP,
        # mirroring the reference's batch-coupled tf.nn.moments
        # (spade/models/spade.py:21).
        b = xs.shape[0]
        hw = xs.shape[1] * xs.shape[2]
        x2 = xs.reshape(b, hw, xs.shape[-1])
        ones = jnp.ones((b, 1, hw), xs.dtype)
        dn = (((2,), (1,)), ((0,), (0,)))
        s1 = jax.lax.dot_general(ones, x2, dn,
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones, x2 * x2, dn,
                                 preferred_element_type=jnp.float32)
        s1 = jnp.sum(s1, axis=0).reshape(1, 1, 1, -1)
        s2 = jnp.sum(s2, axis=0).reshape(1, 1, 1, -1)
    else:
        s1 = jnp.sum(xs, axis=axes, keepdims=True)
        s2 = jnp.sum(xs * xs, axis=axes, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean, var


def spade_moments_centered(x: jnp.ndarray, stats: str = "batch"):
    """Two-pass SPADE moments that stream ``x`` in its NATIVE (bf16) dtype.

    The single-pass E[x^2] - E[x]^2 form needs f32 inputs: with bf16 the
    2^-9 rounding of x^2 is amplified without bound when mean >> std
    (catastrophic cancellation — measured 40%+ normalization error on real
    activation statistics).  Here the mean comes from a bf16 ones-matmul
    (EXACT: bf16 values are exact in the f32 accumulator), and the variance
    from fused f32 centered squares — all positive, no cancellation; the
    reduction is a VPU sum, but x is only ever read at 2 bytes/element and
    no f32 copy of the tensor is materialized.
    """
    axes = (0, 1, 2) if stats == "batch" else (1, 2)
    n = 1.0
    for a in axes:
        n *= x.shape[a]
    if stats == "batch" and x.ndim == 4:
        b = x.shape[0]
        hw = x.shape[1] * x.shape[2]
        x2 = x.reshape(b, hw, x.shape[-1])
        ones = jnp.ones((b, 1, hw), x.dtype)
        dn = (((2,), (1,)), ((0,), (0,)))
        s1 = jax.lax.dot_general(ones, x2, dn,
                                 preferred_element_type=jnp.float32)
        mean = (jnp.sum(s1, axis=0) / n).reshape(1, 1, 1, -1)
    else:
        mean = jnp.mean(x.astype(jnp.float32), axis=axes, keepdims=True)
    xc = x.astype(jnp.float32) - mean
    var = jnp.mean(xc * xc, axis=axes, keepdims=True)
    return mean, var


class _ConvParams(nn.Module):
    """Declares a conv's kernel/bias params (same tree layout as nn.Conv)
    without issuing the conv — lets SPADE fuse gamma+beta into one conv while
    keeping the checkpoint-import param layout byte-compatible."""

    features: int
    in_features: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k = self.param("kernel", glorot_uniform,
                       (self.kernel, self.kernel, self.in_features,
                        self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SPADE(nn.Module):
    """Spatially-adaptive denormalization (reference: spade/models/spade.py).

    The 2-channel conditioning map (ortho + low-res DEM) is resized to the
    feature resolution with nearest-neighbour, passed through a shared
    128-channel 3x3 ReLU conv, and projected to per-pixel gamma/beta.  The
    input features are normalized with moments over axes (0, 1, 2) — i.e.
    *batch-coupled* statistics, exactly as the reference's tf.nn.moments call
    (spade.py:21).  Under pjit data parallelism the batch axis is sharded and
    XLA inserts the cross-device reduction automatically, preserving global
    batch statistics.  Set ``stats="instance"`` for per-sample moments (the
    published SPADE paper's choice).
    """

    filters: int
    epsilon: float = 1e-5
    hidden: int = 128
    stats: str = "batch"  # "batch" (reference parity) | "instance"
    dtype: Any = jnp.float32
    # Moments default to float32 for training stability; inference can set
    # bfloat16 to skip the cast round-trips (fidelity-tested tolerance).
    stats_dtype: Any = jnp.float32
    # Fused gamma/beta conv: single-chip HBM win (see below), but under
    # tensor parallelism the 2F-channel output's halves land on different
    # model shards and the gamma/beta slices force collective-permutes —
    # set False on TP meshes (ModelConfig.fuse_spade_gb).  Same param tree
    # either way; outputs bitwise identical.
    fuse_gb: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 moments=None, normalized=None) -> jnp.ndarray:
        mask = resize_nearest(mask, (x.shape[1], x.shape[2]))
        h = nn.Conv(self.hidden, (3, 3), padding="SAME", kernel_init=glorot_uniform,
                    dtype=self.dtype, name="conv")(mask.astype(self.dtype))
        h = nn.relu(h)
        # gamma and beta read the same hidden activations, so their two convs
        # are issued as ONE conv over concatenated kernels (~30% of generator
        # FLOPs land here; one big MXU matmul beats two half-size ones).
        # Params stay separate (checkpoint-import layout unchanged) and each
        # output channel is an independent dot product, so the results are
        # bitwise identical to two convs.
        k_gamma, b_gamma = _ConvParams(self.filters, self.hidden,
                                       name="conv_gamma")()
        k_beta, b_beta = _ConvParams(self.filters, self.hidden,
                                     name="conv_beta")()
        dn = jax.lax.conv_dimension_numbers(
            h.shape, k_gamma.shape, ("NHWC", "HWIO", "NHWC"))
        if self.fuse_gb:
            k_gb = jnp.concatenate([k_gamma, k_beta],
                                   axis=-1).astype(self.dtype)
            b_gb = jnp.concatenate([b_gamma, b_beta]).astype(self.dtype)
            gb = jax.lax.conv_general_dilated(
                h, k_gb, (1, 1), "SAME", dimension_numbers=dn) + b_gb
            gamma, beta = gb[..., : self.filters], gb[..., self.filters :]
        else:
            # Separate convs: with replicated kernels GSPMD partitions each
            # output to match its (possibly channel-sharded) consumer by
            # local kernel slicing — zero communication.
            gamma = jax.lax.conv_general_dilated(
                h, k_gamma.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=dn) + b_gamma.astype(self.dtype)
            beta = jax.lax.conv_general_dilated(
                h, k_beta.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=dn) + b_beta.astype(self.dtype)
        if normalized is None:
            # ``moments``/``normalized`` overrides: a 2x-nearest upsample
            # duplicates every element 4x, so both the moments and the
            # normalized tensor of the upsampled input equal the upsampled
            # pre-normalization results — the generator computes them at
            # quarter traffic and shares them across spade_1/spade_3
            # (trace: stat reductions alone were 18% of tile time).
            xs = x.astype(self.stats_dtype)
            if moments is None:
                mean, var = spade_moments(xs, self.stats)
            else:
                mean, var = moments
            normalized = (xs - mean) * jnp.reciprocal(
                jnp.sqrt(var + self.epsilon))
        return gamma * normalized.astype(self.dtype) + beta


class SpadeResidualBlock(nn.Module):
    """SPADE residual block (reference: spade/models/blocks.py:9-38).

    Two SPADE -> LeakyReLU -> 3x3 conv passes, with a learned SPADE skip when
    the channel count changes.
    """

    filters: int
    alpha: float = 0.2
    stats: str = "batch"
    dtype: Any = jnp.float32
    stats_dtype: Any = jnp.float32
    fuse_gb: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 input_normalized=None) -> jnp.ndarray:
        in_filters = x.shape[-1]
        # spade_1 and spade_3 both normalize the block INPUT, so they share
        # one normalized tensor (computed once — pre-upsample by the
        # generator, which is bitwise identical and 4x cheaper).
        if input_normalized is None:
            xs = x.astype(self.stats_dtype)
            mean, var = spade_moments(xs, self.stats)
            input_normalized = (xs - mean) * jnp.reciprocal(
                jnp.sqrt(var + 1e-5))
        h = SPADE(in_filters, stats=self.stats, dtype=self.dtype,
                  stats_dtype=self.stats_dtype, fuse_gb=self.fuse_gb,
                  name="spade_1")(x, mask, normalized=input_normalized)
        h = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=glorot_uniform, name="conv_1")(leaky_relu(h, self.alpha))
        h = SPADE(self.filters, stats=self.stats, dtype=self.dtype,
                  stats_dtype=self.stats_dtype, fuse_gb=self.fuse_gb,
                  name="spade_2")(h, mask)
        h = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=glorot_uniform, name="conv_2")(leaky_relu(h, self.alpha))
        if self.filters != in_filters:
            skip = SPADE(in_filters, stats=self.stats, dtype=self.dtype,
                         stats_dtype=self.stats_dtype, fuse_gb=self.fuse_gb,
                         name="spade_3")(x, mask, normalized=input_normalized)
            skip = nn.Conv(self.filters, (3, 3), padding="SAME",
                           kernel_init=glorot_uniform, dtype=self.dtype,
                           name="conv_3")(leaky_relu(skip, self.alpha))
        else:
            skip = x
        return skip + h


class DownsampleBlock(nn.Module):
    """Strided conv + optional InstanceNorm + LeakyReLU + optional dropout
    (reference: spade/models/blocks.py:41-68).

    The reference never enables dropout in this block (its callers leave
    ``apply_dropout=False``), but the knob is preserved.
    """

    channels: int
    kernel: int
    strides: int = 2
    apply_norm: bool = True
    apply_activation: bool = True
    apply_dropout: bool = False
    alpha: float = 0.2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.channels,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=False,
            kernel_init=glorot_normal,
            dtype=self.dtype,
            name="conv",
        )(x.astype(self.dtype))
        if self.apply_norm:
            x = InstanceNorm(dtype=self.dtype, name="norm")(x)
        if self.apply_activation:
            x = leaky_relu(x, self.alpha)
        if self.apply_dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
