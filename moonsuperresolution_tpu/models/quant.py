"""Int8 inference path for the SPADE generator.

TPU v5e executes int8 x int8 -> int32 convolutions at 2x the bf16 MXU rate
(394 vs 197 peak TOPS), and the generator convs are ~98% of inference time
(COVERAGE.md ablation) — so weight+activation int8 quantization is the main
single-chip lever toward the <5 min full-map target (BASELINE.md).

Scheme (standard dynamic PTQ):
- weights: symmetric per-output-channel int8, quantized once at load time;
- activations: symmetric per-tensor int8 with the scale computed on the fly
  (one max-reduction per conv input — cheap next to the conv);
- accumulation in int32, dequantized as ``y = acc * (s_x * s_w[c]) + bias``;
- everything that is small or precision-critical stays bf16/f32: the latent
  Dense, the 2->128 mask convs, SPADE statistics/normalization, the 4x4
  output head, and the whole encoder.

This is an *opt-in* speed mode (``DSRConfig.quantize = "int8"``): outputs
deviate from the f32/bf16 reference path by design; the deviation is
measured by tests/test_quant.py and reported by bench.py.  The forward
mirrors ``models/networks.py::SpadeGenerator`` (reference:
spade/models/networks.py:37-57) exactly, with the gamma/beta convs of each
SPADE fused into one int8 conv like the bf16 path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from moonsuperresolution_tpu.ops.resize import resize_nearest


def _quant_kernel_per_channel(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.
    Returns (int8 kernel, float32 scale[Cout])."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def _quant_act_per_tensor(x: jnp.ndarray):
    """Dynamic symmetric per-tensor int8 activation quantization."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def _qconv(x: jnp.ndarray, qk: jnp.ndarray, w_scale: jnp.ndarray,
           bias: jnp.ndarray, out_dtype=jnp.bfloat16,
           s_x=None, record=None, site: str = "",
           acc_dtype=jnp.int32, x_quantized: bool = False,
           out_scale=None) -> jnp.ndarray:
    """int8 conv: quantize x (dynamic, or with the calibrated static scale
    ``s_x`` — which removes the per-tensor max reduction), s8xs8 conv,
    dequantize.

    ``acc_dtype`` picks the conv *output* element type.  int32 is exact;
    bfloat16 halves the conv-result write traffic plus the dequant read
    traffic (the accumulator itself stays wide inside the MXU; only the
    HBM materialization is rounded).  The rounding adds ~2^-9 relative
    error to activations that already carry ~0.5% quantization noise —
    bounded by tests/test_quant.py.

    ``x_quantized=True`` means x is ALREADY s8 at scale ``s_x`` — the
    producer conv quantized it in its own epilogue (see ``_conv_bf16``'s
    ``out_scale``), so no quantize pass is issued here.

    ``out_scale`` (scalar or per-channel [Cout]) re-quantizes the conv
    RESULT to s8 in the epilogue: y_q = round(clip(y / out_scale)).  The
    consumer dequantizes with the same static scale.  Halves the result's
    HBM write and the consumer's read vs bf16 — used for the SPADE
    gamma/beta maps, whose re-read dominates the affine+quantize passes
    (PROFILE.md §3)."""
    if x_quantized:
        xq = x  # s_x is the producer's (static) scale, required
    elif s_x is None:
        xq, s_x = _quant_act_per_tensor(x)
        if record is not None:
            # Traced recording: the calibration forward runs under jit (one
            # compiled program; the old eager per-conv float() readbacks
            # took tens of minutes on CPU) and returns the scale dict.
            prev = record.get(site)
            record[site] = s_x if prev is None else jnp.maximum(prev, s_x)
    else:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(xq.shape, qk.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, qk, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=acc_dtype,
    )
    y = acc.astype(jnp.float32) * (s_x * w_scale) + bias
    if out_scale is not None:
        # out_scale is the PRECOMPUTED INVERSE scale (calibrate stores
        # ".gb_inv"): a per-channel divide in the conv epilogue measurably
        # slowed the conv (+1.8 ms/step, trace), and an in-graph
        # jnp.reciprocal regressed the fused tile program — so the
        # reciprocal is taken once on the host at calibration time.
        return jnp.clip(jnp.round(y * out_scale),
                        -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def _conv_bf16(x, kernel, bias, relu: bool = False, out_scale=None):
    """bf16 conv (+bias), optional fused relu, and — with ``out_scale`` —
    a fused static requantize epilogue producing s8 directly.

    The epilogue arithmetic (relu -> f32/scale -> round -> clip -> s8) is
    BIT-IDENTICAL to the separate static quantize pass it replaces
    (``_qconv``'s s_x branch); XLA fuses it into the conv's output
    epilogue, so the bf16 activation never materializes in HBM and the
    standalone quantize pass (10 ms/step in the round-5 trace, PROFILE.md
    §3) disappears for these edges."""
    k = jnp.asarray(kernel, x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn
    ) + jnp.asarray(bias, x.dtype)
    if relu:
        y = jax.nn.relu(y)
    if out_scale is not None:
        return jnp.clip(jnp.round(y.astype(jnp.float32) / out_scale),
                        -127, 127).astype(jnp.int8)
    return y


def _quantize_conv(p):
    kq, s = _quant_kernel_per_channel(p["kernel"])
    return {"kernel": kq, "scale": s,
            "bias": jnp.asarray(p["bias"], jnp.float32)}


def _quantize_spade(sp):
    """Quantize one SPADE's gamma/beta convs (fused) — the mask conv stays
    bf16 (2 input channels; negligible FLOPs, precision-sensitive)."""
    kq_g, s_g = _quant_kernel_per_channel(sp["conv_gamma"]["kernel"])
    kq_b, s_b = _quant_kernel_per_channel(sp["conv_beta"]["kernel"])
    return {
        "conv": {"kernel": jnp.asarray(sp["conv"]["kernel"], jnp.float32),
                 "bias": jnp.asarray(sp["conv"]["bias"], jnp.float32)},
        "gb": {
            "kernel": jnp.concatenate([kq_g, kq_b], axis=-1),
            "scale": jnp.concatenate([s_g, s_b]),
            "bias": jnp.concatenate([
                jnp.asarray(sp["conv_gamma"]["bias"], jnp.float32),
                jnp.asarray(sp["conv_beta"]["bias"], jnp.float32),
            ]),
        },
    }


@dataclasses.dataclass(frozen=True)
class QuantizedSpadeGenerator:
    """Int8 twin of ``models/networks.py::SpadeGenerator`` (same param tree
    as input; quantized once via :meth:`quantize`)."""

    image_size: int
    alpha: float = 0.2
    stats: str = "batch"
    channel_plan: tuple = (1024, 1024, 1024, 512, 256, 128)
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Conv-output element type ("int32" exact | "bfloat16" halves the
    # conv-result HBM write + dequant read traffic).  String, so the frozen
    # dataclass stays hashable as a jit static argument.
    acc_dtype: str = "int32"
    # SPADE-moment input dtype: "bfloat16" streams the activations into the
    # ones-matmul moments at half the bytes (accumulation stays f32 via
    # preferred_element_type — the MXU's native mode; the old f32 input
    # forced a slow f32 matmul) and materializes the normalized tensor as
    # bf16 instead of f32.  "float32" restores the exact-moment path.
    # Deviation bounded by tests/test_quant.py either way.
    moments_dtype: str = "bfloat16"
    # Subpixel head: exact phase-conv + depth-to-space equivalent of the
    # final upsample + 4x4 conv (networks.py::collapse_head_kernel) — the
    # full-resolution 128-channel bf16 activation never materializes.
    subpixel_head: bool = True
    # Static mode only: re-quantize the SPADE gamma/beta conv results to
    # per-channel s8 in the conv epilogue (halves their HBM write + the
    # affine pass's read).  Adds per-channel max/254 deviation on gamma/
    # beta — bounded by tests/test_quant.py.  False restores bf16 maps.
    requant_gb: bool = True

    # ------------------------------------------------------------- quantize

    def quantize(self, params) -> dict:
        """Generator flax params -> quantized param tree (call once, outside
        jit; the result is a valid jit argument)."""
        q = {
            "dense": {"kernel": jnp.asarray(params["dense"]["kernel"],
                                            jnp.float32),
                      "bias": jnp.asarray(params["dense"]["bias"],
                                          jnp.float32)},
            "head": {"kernel": jnp.asarray(params["head"]["kernel"],
                                           jnp.float32),
                     "bias": jnp.asarray(params["head"]["bias"],
                                         jnp.float32)},
        }
        for i in range(len(self.channel_plan)):
            blk = params[f"resblock_{i}"]
            qb = {
                "spade_1": _quantize_spade(blk["spade_1"]),
                "spade_2": _quantize_spade(blk["spade_2"]),
                "conv_1": _quantize_conv(blk["conv_1"]),
                "conv_2": _quantize_conv(blk["conv_2"]),
            }
            if "spade_3" in blk:
                qb["spade_3"] = _quantize_spade(blk["spade_3"])
                qb["conv_3"] = _quantize_conv(blk["conv_3"])
            q[f"resblock_{i}"] = qb
        return q

    # -------------------------------------------------------------- forward

    @property
    def _acc(self):
        return jnp.bfloat16 if self.acc_dtype == "bfloat16" else jnp.int32

    def _normalize(self, x):
        """Moments + normalized tensor.  With moments_dtype="bfloat16" the
        two-pass centered scheme (layers.spade_moments_centered) streams the
        bf16 activations directly — exact bf16-dot mean, cancellation-free
        centered variance — and the normalized tensor materializes as bf16;
        no f32 copy of the activations ever hits HBM.  "float32" restores
        the single-pass f32 path (exact parity with the bf16 generator)."""
        from moonsuperresolution_tpu.models.layers import (
            spade_moments,
            spade_moments_centered,
        )

        if self.moments_dtype == "bfloat16":
            mean, var = spade_moments_centered(x, self.stats)
            # Normalize in bf16 arithmetic: one bf16-in/bf16-out elementwise
            # chain that fuses into the consumer, instead of an f32
            # normalized tensor + separate downcast pass (0.53 ms/step in
            # the round-5 trace).  mean/rsqrt are per-channel scalars
            # rounded once to bf16 (~2^-9 relative, far under the int8
            # activation noise; bounds unchanged in tests/test_quant.py).
            r = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
            normalized = (x - mean.astype(self.dtype)) * r.astype(self.dtype)
        else:
            mean, var = spade_moments(x.astype(jnp.float32), self.stats)
            normalized = (x.astype(jnp.float32) - mean) * jnp.reciprocal(
                jnp.sqrt(var + self.epsilon))
        return normalized

    def _spade(self, qs, x, mask, normalized=None, scales=None,
               record=None, site: str = ""):
        mask = resize_nearest(mask, (x.shape[1], x.shape[2]))
        s_in = None if scales is None else scales[site]
        if s_in is not None:
            # Static path: the gb conv's input quantize runs inside the
            # mask conv's epilogue (bit-identical; see _conv_bf16) — the
            # bf16 h tensor never hits HBM.
            h8 = _conv_bf16(mask.astype(self.dtype), qs["conv"]["kernel"],
                            qs["conv"]["bias"], relu=True, out_scale=s_in)
            # Re-quantized gamma/beta maps (per-channel s8): halves the gb
            # conv's result write AND this affine pass's dominant read —
            # the single biggest non-conv cost in the trace (PROFILE.md
            # §3).  Deviation is bounded per channel by that channel's
            # calibrated max/254 and measured by tests/test_quant.py.
            s_gb = scales.get(f"{site}.gb") if self.requant_gb else None
            s_gb_inv = scales.get(f"{site}.gb_inv") if self.requant_gb \
                else None
            if s_gb_inv is None:
                s_gb = None  # old calibration without the inverse: bf16 path
            gb = _qconv(h8, qs["gb"]["kernel"], qs["gb"]["scale"],
                        qs["gb"]["bias"], out_dtype=self.dtype,
                        s_x=s_in, x_quantized=True, acc_dtype=self._acc,
                        out_scale=s_gb_inv)
        else:
            h = _conv_bf16(mask.astype(self.dtype), qs["conv"]["kernel"],
                           qs["conv"]["bias"], relu=True)
            gb = _qconv(h, qs["gb"]["kernel"], qs["gb"]["scale"],
                        qs["gb"]["bias"], out_dtype=self.dtype,
                        s_x=None, record=record, site=site,
                        acc_dtype=self._acc)
            if record is not None and self.requant_gb:
                amax = jnp.max(jnp.abs(gb.astype(jnp.float32)),
                               axis=(0, 1, 2))
                cur = amax / 127.0
                prev = record.get(f"{site}.gb")
                record[f"{site}.gb"] = (cur if prev is None
                                        else jnp.maximum(prev, cur))
        f = gb.shape[-1] // 2
        gamma, beta = gb[..., :f], gb[..., f:]
        if normalized is None:
            normalized = self._normalize(x)
        if gb.dtype == jnp.int8:
            # Dequantize inline: gamma_real = gq * s[c], beta_real = bq * s[c'].
            sg = jnp.asarray(s_gb[:f], self.dtype)
            sb = jnp.asarray(s_gb[f:], self.dtype)
            return (gamma.astype(self.dtype) * sg * normalized.astype(self.dtype)
                    + beta.astype(self.dtype) * sb)
        return gamma * normalized.astype(self.dtype) + beta

    def _resblock(self, qb, x, mask, input_normalized=None, scales=None,
                  record=None, prefix: str = ""):
        lrelu = lambda v: jax.nn.leaky_relu(v, self.alpha)

        def s(site):
            return None if scales is None else scales[site]

        h = self._spade(qb["spade_1"], x, mask, normalized=input_normalized,
                        scales=scales, record=record,
                        site=f"{prefix}.spade_1")
        h = _qconv(lrelu(h), qb["conv_1"]["kernel"], qb["conv_1"]["scale"],
                   qb["conv_1"]["bias"], out_dtype=self.dtype,
                   s_x=s(f"{prefix}.conv_1"), record=record,
                   site=f"{prefix}.conv_1", acc_dtype=self._acc)
        h = self._spade(qb["spade_2"], h, mask, scales=scales, record=record,
                        site=f"{prefix}.spade_2")
        h = _qconv(lrelu(h), qb["conv_2"]["kernel"], qb["conv_2"]["scale"],
                   qb["conv_2"]["bias"], out_dtype=self.dtype,
                   s_x=s(f"{prefix}.conv_2"), record=record,
                   site=f"{prefix}.conv_2", acc_dtype=self._acc)
        if "conv_3" in qb:
            skip = self._spade(qb["spade_3"], x, mask,
                               normalized=input_normalized, scales=scales,
                               record=record, site=f"{prefix}.spade_3")
            skip = _qconv(lrelu(skip), qb["conv_3"]["kernel"],
                          qb["conv_3"]["scale"], qb["conv_3"]["bias"],
                          out_dtype=self.dtype,
                          s_x=s(f"{prefix}.conv_3"), record=record,
                          site=f"{prefix}.conv_3", acc_dtype=self._acc)
        else:
            skip = x
        return skip + h

    def calibrate(self, qparams, latent: jnp.ndarray, source: jnp.ndarray,
                  margin: float = 1.05) -> dict:
        """One (or more, via repeated calls on the returned tree) jitted
        forward recording each conv input's dynamic scale; returns qparams
        with ``act_scales`` added.  With static scales the per-conv max
        reduction disappears from the compiled program (the clip handles
        rare saturation).  Calibration inputs should span the expected
        range — engine inputs are per-patch min-max normalized to
        [-0.5, 0.5], so ranges are stable across real data."""
        import numpy as np

        base = {k: v for k, v in qparams.items() if k != "act_scales"}
        rec = _calibration_scales(self, base, latent, source)
        # ONE batched device->host transfer per dict: per-site np.asarray
        # would issue a ~25 ms round-trip EACH through remote-attached
        # runtimes (~3 s for the ~110 sites, inside the engine's timed
        # first-tile path).
        rec = jax.device_get(rec)
        prev = jax.device_get(qparams.get("act_scales", {}))
        # Conv-input sites are scalars; ".gb" result sites are per-channel
        # vectors — merge both elementwise.
        rec = {k: np.asarray(v, np.float32) for k, v in rec.items()}
        prev = {k: np.asarray(v, np.float32) / margin  # un-margin previous
                for k, v in prev.items()
                if not k.endswith("_inv")}  # derived below, not merged
        merged = {k: np.maximum(rec.get(k, 0.0), prev.get(k, 0.0))
                  for k in set(rec) | set(prev)}
        out = {}
        for k, v in merged.items():
            sv = v * margin
            out[k] = jnp.asarray(sv, jnp.float32)
            if k.endswith(".gb"):
                # Precomputed inverse for the requant epilogue (see _qconv:
                # a divide or in-graph reciprocal there costs real time).
                out[k + "_inv"] = jnp.asarray(1.0 / sv, jnp.float32)
        return dict(qparams, act_scales=out)

    def apply(self, qparams, latent: jnp.ndarray,
              source: jnp.ndarray, _record=None) -> jnp.ndarray:
        sw = self.image_size // 2**6
        x = (latent.astype(self.dtype)
             @ jnp.asarray(qparams["dense"]["kernel"], self.dtype)
             + jnp.asarray(qparams["dense"]["bias"], self.dtype))
        x = x.reshape(-1, sw, sw, self.channel_plan[0])
        source = source.astype(self.dtype)
        from moonsuperresolution_tpu.models.networks import (
            subpixel_head_conv,
            upsample2x_nearest,
        )

        scales = qparams.get("act_scales")
        x_hat_up = None
        n_blocks = len(self.channel_plan)
        for i in range(n_blocks):
            x = self._resblock(qparams[f"resblock_{i}"], x, source,
                               input_normalized=x_hat_up, scales=scales,
                               record=_record, prefix=f"r{i}")
            if i + 1 == n_blocks and self.subpixel_head:
                break
            # pre-upsample moments + normalization, same trick as
            # models/networks.py::SpadeGenerator (mathematically identical;
            # f32 accumulation order differs, so equality is within ulps)
            x_hat_up = upsample2x_nearest(self._normalize(x))
            x = upsample2x_nearest(x)
        x = jax.nn.leaky_relu(x, 0.2)
        k_head = jnp.asarray(qparams["head"]["kernel"], self.dtype)
        b_head = jnp.asarray(qparams["head"]["bias"], self.dtype)
        if self.subpixel_head:
            x = subpixel_head_conv(x, k_head, b_head)
        else:
            x = _conv_bf16(x, k_head, b_head)
        return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=0)
def _calibration_scales(qgen: QuantizedSpadeGenerator, base_params,
                        latent: jnp.ndarray, source: jnp.ndarray) -> dict:
    """One compiled dynamic-scale forward; returns {site: max |x|/127}.
    (qgen is a frozen dataclass, so it hashes as a static argument.)"""
    record = {}
    qgen.apply(base_params, latent, source, _record=record)
    return record
