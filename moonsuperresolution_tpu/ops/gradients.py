"""Finite-difference image gradients with TensorFlow semantics.

``tf.image.image_gradients`` (used by the reference's gradient / surface-
normal losses, reference: spade/losses.py:11-23) computes forward differences
and zero-pads the trailing row/column so the output keeps the input shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def image_gradients(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(dy, dx)`` for an NHWC batch ``[B, H, W, C]``.

    ``dy[b, i] = x[b, i+1] - x[b, i]`` with a zero last row;
    ``dx[b, :, j] = x[b, :, j+1] - x[b, :, j]`` with a zero last column.
    Matches ``tf.image.image_gradients`` exactly.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0), (0, 0)))
    dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return dy, dx
