"""Pallas kernel semantics tests (interpret mode — runs on CPU).

The compiled-mode behavior is exercised on real TPU hardware by bench.py and
the engine; these tests pin the kernel's semantics against the pure-XLA
reference implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from moonsuperresolution_tpu.ops.pallas.patches import (
    extract_normalize_patches,
    extract_normalize_patches_reference,
)


@pytest.mark.parametrize("stride,size,tile", [(8, 32, 64), (16, 64, 128)])
def test_fused_patch_prep_matches_reference(rng, stride, size, tile):
    L = tile + 2 * (size - stride)
    img = (rng.standard_normal((L, L)) * 30 + 128).astype(np.float32)
    dem = (rng.standard_normal((L, L)) * 50 + 1500).astype(np.float32)
    dem[10:13, 20:23] = -32768.0
    g = tile // stride + size // stride - 1

    x1, v1, a1, b1 = extract_normalize_patches(
        jnp.asarray(img), jnp.asarray(dem), (g, g), stride, size, -32768.0,
        interpret=True,
    )
    x0, v0, a0, b0 = extract_normalize_patches_reference(
        jnp.asarray(img), jnp.asarray(dem), (g, g), stride, size, -32768.0
    )
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    assert (1 - np.asarray(v0)).sum() > 0  # the nodata hole rejects patches
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=1e-6)


def test_stride_must_be_multiple_of_8(rng):
    img = np.zeros((64, 64), np.float32)
    with pytest.raises(ValueError):
        extract_normalize_patches(
            jnp.asarray(img), jnp.asarray(img), (5, 5), 4, 16, -1.0,
            interpret=True,
        )
