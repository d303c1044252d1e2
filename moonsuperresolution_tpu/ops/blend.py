"""On-device Gaussian-weighted overlap blending with uncertainty.

The reference assembles overlapping SR patches on the host with a sequential
weighted-incremental (West) mean/variance loop over ~64 generations per pixel
(reference: process_full_tiles.py:543-594).  West's recurrence is algebraically
identical to the weighted moments

    mean = sum(w_i x_i) / sum(w_i)
    S    = sum(w_i (x_i - mean)^2),     std = sqrt(S / sum(w_i))

so on TPU we compute them with two *fold* (overlap-add) passes, entirely
on-device and in parallel.  The key trick: the sliding-window grid with patch
size P and stride S decomposes into m^2 subsets (m = ceil(P/S)) whose patches
do not overlap, so each subset is placed with pure reshapes/transposes — no
scatter, no data-dependent control flow, fully XLA-fusible.

The two-pass scheme (mean first, then centered second moments) is numerically
*stronger* than the reference's single-pass recurrence in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def gaussian_blend_kernel(
    image_size: int, sigma_div: float = 5.0, purge: int | None = None
) -> np.ndarray:
    """Normalized 2-D Gaussian blending window, matching the reference
    (process_full_tiles.py:527-541): sigma = image_size / sigma_div, min-max
    normalized to [0, 1], plus 1e-7, then cropped by ``purge`` pixels per side
    (default image_size // 16, process_full_tiles.py:572-573).
    """
    n = image_size
    x = np.linspace(-n / 2, n / 2, n)
    xx, yy = np.meshgrid(x, x)
    s = n / sigma_div
    k = 1.0 / (2.0 * np.pi * s * s) * np.exp(-(xx**2 + yy**2) / (2.0 * s * s))
    k = (k - k.min()) / (k.max() - k.min())
    k = k + 1e-7
    if purge is None:
        purge = image_size // 16
    if purge:
        k = k[purge:-purge, purge:-purge]
    return k.astype(np.float32)


def fold_add(patches: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Overlap-add of a regular patch grid.

    Args:
      patches: ``[Gy, Gx, P, P]`` or ``[C, Gy, Gx, P, P]`` patch values;
        patch (i, j) covers output rows ``i*stride : i*stride+P`` and cols
        ``j*stride : j*stride+P``.  A leading channel axis folds several
        accumulators (e.g. w and w*x) in one traversal of the patch data.
      stride: grid stride in pixels.

    Returns:
      ``[(Gy-1)*stride + P, (Gx-1)*stride + P]`` dense sum (with the leading
      channel axis preserved if present).

    Patches whose grid index is congruent modulo ``m = ceil(P/stride)`` never
    overlap, so each of the m^2 congruence classes is laid out with a single
    reshape/transpose and added at a static offset.  The m^2 loop is a static
    Python loop — XLA sees m^2 fused pad+add ops, no scatters.
    """
    squeeze = patches.ndim == 4
    if squeeze:
        patches = patches[None]
    c, gy, gx, p, p2 = patches.shape
    assert p == p2
    m = -(-p // stride)
    blk = m * stride
    out_h = (gy - 1) * stride + p
    out_w = (gx - 1) * stride + p
    # Pad each patch to the non-overlap block size.
    pp = jnp.pad(patches, ((0, 0), (0, 0), (0, 0), (0, blk - p), (0, blk - p)))
    # Slack of one block covers the largest congruence-class extent.
    acc = jnp.zeros((c, out_h + blk, out_w + blk), dtype=patches.dtype)
    for a in range(m):
        for b in range(m):
            sub = pp[:, a::m, b::m]  # [C, ni, nj, blk, blk]
            ni, nj = sub.shape[1], sub.shape[2]
            if ni == 0 or nj == 0:
                continue
            plane = sub.transpose(0, 1, 3, 2, 4).reshape(c, ni * blk, nj * blk)
            r0, c0 = a * stride, b * stride
            acc = acc.at[:, r0 : r0 + ni * blk, c0 : c0 + nj * blk].add(plane)
    acc = acc[:, :out_h, :out_w]
    return acc[0] if squeeze else acc


def extract_patches(
    plane: jnp.ndarray, grid_hw: tuple[int, int], stride: int, size: int
) -> jnp.ndarray:
    """Extract the regular ``[Gy, Gx, size, size]`` patch grid from a plane.

    Inverse of ``fold_add`` via the same congruence-class decomposition:
    patches in the same class (grid index mod m, m = ceil(size/stride)) tile
    the plane without overlap, so each class is a static strided slice plus
    reshapes.  (A vmap-of-dynamic-slice formulation is semantically identical
    but makes XLA:TPU compile time explode at production patch counts.)
    """
    gy, gx = grid_hw
    m = -(-size // stride)
    blk = m * stride
    # Pad so every class's strided view is in bounds.
    need_h = (m - 1) * stride + (-(-gy // m)) * blk
    need_w = (m - 1) * stride + (-(-gx // m)) * blk
    ph = max(0, need_h - plane.shape[0])
    pw = max(0, need_w - plane.shape[1])
    if ph or pw:
        plane = jnp.pad(plane, ((0, ph), (0, pw)))
    out = jnp.zeros((gy, gx, size, size), plane.dtype)
    for a in range(m):
        ni = len(range(a, gy, m))
        if ni == 0:
            continue
        for b in range(m):
            nj = len(range(b, gx, m))
            if nj == 0:
                continue
            sub = plane[a * stride : a * stride + ni * blk,
                        b * stride : b * stride + nj * blk]
            sub = sub.reshape(ni, blk, nj, blk).transpose(0, 2, 1, 3)
            out = out.at[a::m, b::m].set(sub[:, :, :size, :size])
    return out


def fold_weighted_moments(
    values: jnp.ndarray,
    valid: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gaussian-weighted mean / std / coverage over overlapping generations.

    Args:
      values: ``[Gy, Gx, P, P]`` denormalized SR patches (already purge-cropped).
      valid:  ``[Gy, Gx]`` 0/1 mask; invalid patches contribute zero weight
        (the reference simply skips them, process_full_tiles.py:391-395).
      weight: ``[P, P]`` blending window (``gaussian_blend_kernel``).
      stride: grid stride.

    Returns:
      ``(mean, std, w_sum, good)`` planes of shape
      ``[(Gy-1)*stride+P, (Gx-1)*stride+P]``; ``good`` is uint8 coverage.
      Matches process_full_tiles.py:575-594 semantics (std = sqrt(S/w_sum)).
    """
    gy, gx, p, _ = values.shape
    f32 = jnp.float32
    vmask = valid.astype(f32)[:, :, None, None]
    w_eff = weight.astype(f32)[None, None] * vmask
    x = values.astype(f32)

    # Fold w and w*x in a single traversal of the patch data.
    both = fold_add(jnp.stack([w_eff * jnp.ones_like(x), w_eff * x]), stride)
    w_sum, wx_sum = both[0], both[1]
    safe_w = jnp.where(w_sum > 0, w_sum, 1.0)
    mean = wx_sum / safe_w

    mean_p = extract_patches(mean, (gy, gx), stride, p)
    m2 = fold_add(w_eff * (x - mean_p) ** 2, stride)
    std = jnp.sqrt(jnp.maximum(m2, 0.0) / safe_w)

    good = (w_sum > 0).astype(jnp.uint8)
    return mean, std, w_sum, good
