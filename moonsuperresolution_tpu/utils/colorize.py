"""Colormap LUT visualization for TensorBoard image summaries.

JAX reimplementation of the reference's grayscale->matplotlib-cmap helper
(reference: sampler.py:95-135): min-max normalize, quantize to 256 levels,
gather from the colormap LUT.  Used to render GT / prediction / input
heightmaps as 'jet' images in the training loop (train_spade_256.py:80-90).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=16)
def _lut(cmap: str) -> np.ndarray:
    import matplotlib

    cm = matplotlib.colormaps[cmap]
    return cm(np.arange(256))[:, :3].astype(np.float32)


def colorize(value: np.ndarray, vmin=None, vmax=None, cmap: str = "jet"):
    """Map [H, W] or [H, W, 1] (or a batch [B, H, W, 1]) to RGB [.., H, W, 3]."""
    value = np.asarray(value, dtype=np.float32)
    if value.ndim >= 3 and value.shape[-1] == 1:
        value = value[..., 0]
    lo = value.min() if vmin is None else vmin
    hi = value.max() if vmax is None else vmax
    norm = (value - lo) / max(hi - lo, 1e-12)
    idx = np.clip(np.round(norm * 255), 0, 255).astype(np.int32)
    return _lut(cmap)[idx]
