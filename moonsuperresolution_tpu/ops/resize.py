"""Image resampling primitives, designed for XLA:TPU.

The reference pipeline resamples rasters with OpenCV on the host
(reference: sampler.py:49-55, process_full_tiles.py:226-244).  On TPU we
instead express separable resampling as two dense matmuls so the work lands
on the MXU and fuses with the surrounding computation.  The resample matrices
are built at trace time from static shapes, so everything stays jittable.

Semantics matched against the reference stack:

- ``resize_nearest``  : half-pixel-center nearest neighbour, the semantics of
  ``tf.image.resize(method="nearest")`` used by the SPADE layer
  (reference: spade/models/spade.py:20).
- ``resize_cubic``    : cubic convolution with OpenCV's a=-0.75 Keys kernel and
  half-pixel centers, the semantics of ``cv2.resize(..., INTER_CUBIC)``
  (reference: process_full_tiles.py:421).
- ``area_downscale``  : integer-factor box averaging, the semantics of
  ``cv2.resize(..., INTER_AREA)`` for integer ratios
  (reference: sampler.py:55, process_full_tiles.py:412-419).
- ``synthesize_lowres_dem`` : the /16 down + cubic-up low-res DEM synthesis
  used to build the 2nd conditioning channel (reference: sampler.py:55).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic-convolution kernel. OpenCV uses a=-0.75."""
    t = np.abs(t)
    t2 = t * t
    t3 = t2 * t
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.maximum(0.0, 1.0 - t)


@functools.lru_cache(maxsize=256)
def _resample_matrix(
    in_size: int, out_size: int, method: str, a: float
) -> np.ndarray:
    """Dense [out_size, in_size] resample matrix with half-pixel centers and
    replicate (clamp) border handling, matching OpenCV/TF conventions.

    No anti-aliasing on downscale (OpenCV INTER_CUBIC/INTER_LINEAR semantics).
    """
    scale = in_size / out_size
    # Half-pixel-center source coordinate of each output pixel.
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    if method == "cubic":
        support = 2
        kernel = lambda t: _cubic_kernel(t, a)
    elif method == "linear":
        support = 1
        kernel = _linear_kernel
    else:
        raise ValueError(f"unknown method {method!r}")

    base = np.floor(src).astype(np.int64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-support + 1, support + 1):
        idx = base + tap
        w = kernel(src - idx)
        idx_c = np.clip(idx, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), idx_c), w)
    # Cubic taps sum to 1 exactly; normalize defensively for edge clamping.
    mat /= mat.sum(axis=1, keepdims=True)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=64)
def cubic_taps(in_size: int, out_size: int, a: float = -0.75):
    """Per-output-pixel cubic taps: (idx[out,4], w[out,4]) int32/float32.

    Same construction as ``_resample_matrix`` (half-pixel centers, clamped
    borders, row-normalized) but keeps the 4 in-support taps explicit —
    including zero-weight ones, so IEEE ``0*nan`` propagates NaN exactly
    like cv2's in-support accumulation.  Used by the streaming engine to
    resample arbitrary row bands without building the dense matrix.
    """
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    taps = np.arange(-1, 3)
    idx = base[:, None] + taps[None, :]
    w = _cubic_kernel(src[:, None] - idx, -0.75 if a is None else a)
    idx = np.clip(idx, 0, in_size - 1)
    w = w / w.sum(axis=1, keepdims=True)
    return idx.astype(np.int32), w.astype(np.float32)


def resample_rows_banded(
    src: np.ndarray, out_size: int, a0: int, a1: int, a: float = -0.75
) -> np.ndarray:
    """Rows [a0, a1) of a full cubic row-resample ``in_h -> out_size`` of
    ``src`` ([in_h, W]), NaN-propagating, float32 accumulation (cv2-like)."""
    idx, w = cubic_taps(src.shape[0], out_size, a)
    idx, w = idx[a0:a1], w[a0:a1]
    out = np.zeros((a1 - a0, src.shape[1]), np.float32)
    for t in range(idx.shape[1]):
        out += w[:, t : t + 1] * src[idx[:, t]]
    return out


def resample_cols_banded(
    src: np.ndarray, out_size: int, a: float = -0.75
) -> np.ndarray:
    """Full cubic column-resample of a row band ([H, in_w] -> [H, out_size]),
    NaN-propagating, float32 accumulation."""
    idx, w = cubic_taps(src.shape[1], out_size, a)
    out = np.zeros((src.shape[0], out_size), np.float32)
    for t in range(idx.shape[1]):
        out += src[:, idx[:, t]] * w[None, :, t]
    return out


def _apply_separable(x: jnp.ndarray, wr: np.ndarray, wc: np.ndarray) -> jnp.ndarray:
    """Apply row/col resample matrices on the (-3, -2) axes of an NHWC-style
    array (``[..., H, W, C]``).  Two matmuls -> MXU."""
    wr_j = jnp.asarray(wr, dtype=x.dtype)
    wc_j = jnp.asarray(wc, dtype=x.dtype)
    # precision="highest" keeps the MXU in full-fp32 mode — resampling
    # weights lose visible accuracy under the default bf16-ish matmul mode.
    # [..., H, W, C] -> [..., H', W, C]
    y = jnp.einsum("oh,...hwc->...owc", wr_j, x, precision="highest")
    # [..., H', W, C] -> [..., H', W', C]
    y = jnp.einsum("pw,...hwc->...hpc", wc_j, y, precision="highest")
    return y


def _with_channel(x: jnp.ndarray):
    """Canonicalise to [..., H, W, C]; returns (array, had_channel)."""
    if x.ndim == 2:
        return x[:, :, None], False
    return x, True


def resize_separable(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    method: str = "cubic",
    a: float = -0.75,
) -> jnp.ndarray:
    """Separable resize of ``[..., H, W, C]`` (or ``[H, W]``) to ``out_hw``."""
    x, had_c = _with_channel(x)
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        wr = _resample_matrix(h, oh, method, a)
        wc = _resample_matrix(w, ow, method, a)
        x = _apply_separable(x, wr, wc)
    return x if had_c else x[..., 0]


def resize_cubic(x, out_hw, a: float = -0.75):
    """cv2.INTER_CUBIC-compatible resize (Keys kernel, a=-0.75)."""
    return resize_separable(x, out_hw, method="cubic", a=a)


def resize_bilinear(x, out_hw):
    return resize_separable(x, out_hw, method="linear")


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Half-pixel-center nearest-neighbour resize of ``[..., H, W, C]``.

    Matches ``tf.image.resize(method="nearest")`` (half_pixel_centers=True),
    which the reference SPADE layer uses to bring the conditioning map to the
    feature resolution (reference: spade/models/spade.py:20).
    """
    x, had_c = _with_channel(x)
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        rows = np.minimum(
            (np.floor((np.arange(oh) + 0.5) * (h / oh))).astype(np.int32), h - 1
        )
        cols = np.minimum(
            (np.floor((np.arange(ow) + 0.5) * (w / ow))).astype(np.int32), w - 1
        )
        x = jnp.take(x, jnp.asarray(rows), axis=-3)
        x = jnp.take(x, jnp.asarray(cols), axis=-2)
    return x if had_c else x[..., 0]


def area_downscale(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Integer-factor box-average downscale (cv2.INTER_AREA for integer
    ratios) on ``[..., H, W, C]``.  Implemented as a reshape-mean, which XLA
    lowers to an efficient reduce."""
    x, had_c = _with_channel(x)
    *lead, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    y = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    y = y.mean(axis=(-4, -2))
    return y if had_c else y[..., 0]


def synthesize_lowres_dem(
    dem: jnp.ndarray, upscaling: int = 16, a: float = -0.75
) -> jnp.ndarray:
    """Synthesize the low-res conditioning DEM: box-average down by
    ``upscaling`` then cubic-resample back up (reference: sampler.py:55).

    ``dem`` is ``[..., H, W, C]`` or ``[H, W]`` with H, W divisible by
    ``upscaling``.
    """
    x, had_c = _with_channel(dem)
    h, w = x.shape[-3], x.shape[-2]
    lo = area_downscale(x, upscaling)
    hi = resize_cubic(lo, (h, w), a=a)
    return hi if had_c else hi[..., 0]
