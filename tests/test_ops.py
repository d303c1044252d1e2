"""Unit tests for the resize / gradient / blend primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonsuperresolution_tpu.ops import (
    area_downscale,
    fold_weighted_moments,
    gaussian_blend_kernel,
    image_gradients,
    resize_cubic,
    resize_nearest,
    synthesize_lowres_dem,
)
from moonsuperresolution_tpu.ops.blend import extract_patches, fold_add


class TestResize:
    def test_nearest_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        x = rng.random((32, 48)).astype(np.float32)
        got = np.asarray(resize_nearest(jnp.asarray(x), (8, 12)))
        want = cv2.resize(x, (12, 8), interpolation=cv2.INTER_NEAREST)
        # cv2 INTER_NEAREST uses a slightly different rounding rule than
        # TF/half-pixel; compare against explicit half-pixel indexing instead.
        rows = np.floor((np.arange(8) + 0.5) * 4).astype(int)
        cols = np.floor((np.arange(12) + 0.5) * 4).astype(int)
        np.testing.assert_array_equal(got, x[np.ix_(rows, cols)])
        assert want.shape == got.shape

    def test_nearest_upscale_integer(self, rng):
        x = rng.random((4, 4)).astype(np.float32)
        got = np.asarray(resize_nearest(jnp.asarray(x), (8, 8)))
        want = np.repeat(np.repeat(x, 2, 0), 2, 1)
        np.testing.assert_array_equal(got, want)

    def test_cubic_matches_cv2_upscale(self, rng):
        cv2 = pytest.importorskip("cv2")
        x = rng.random((16, 16)).astype(np.float32)
        got = np.asarray(resize_cubic(jnp.asarray(x), (64, 64)))
        want = cv2.resize(x, (64, 64), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_cubic_identity(self, rng):
        x = rng.random((16, 16, 3)).astype(np.float32)
        got = np.asarray(resize_cubic(jnp.asarray(x), (16, 16)))
        np.testing.assert_array_equal(got, x)

    def test_area_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        x = rng.random((64, 64)).astype(np.float32)
        got = np.asarray(area_downscale(jnp.asarray(x), 4))
        want = cv2.resize(x, (16, 16), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_synthesize_lowres_dem_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        x = rng.random((256, 256)).astype(np.float32)
        got = np.asarray(synthesize_lowres_dem(jnp.asarray(x), 16))
        lo = cv2.resize(x, (16, 16), interpolation=cv2.INTER_AREA)
        want = cv2.resize(lo, (256, 256), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_batched_channel_shapes(self, rng):
        x = rng.random((2, 32, 32, 2)).astype(np.float32)
        y = resize_cubic(jnp.asarray(x), (16, 16))
        assert y.shape == (2, 16, 16, 2)


class TestGradients:
    def test_matches_manual(self, rng):
        x = rng.random((2, 5, 7, 1)).astype(np.float32)
        dy, dx = image_gradients(jnp.asarray(x))
        want_dy = np.zeros_like(x)
        want_dy[:, :-1] = x[:, 1:] - x[:, :-1]
        want_dx = np.zeros_like(x)
        want_dx[:, :, :-1] = x[:, :, 1:] - x[:, :, :-1]
        np.testing.assert_allclose(np.asarray(dy), want_dy, atol=1e-7)
        np.testing.assert_allclose(np.asarray(dx), want_dx, atol=1e-7)


def _reference_welford(values, valid, weight, stride, out_hw):
    """Direct port of the reference's weighted-incremental accumulation
    (process_full_tiles.py:575-594) as ground truth for the fold."""
    gy, gx, p, _ = values.shape
    h, w = out_hw
    w_sum = np.zeros((h, w), np.float64)
    mean = np.zeros((h, w), np.float64)
    s = np.zeros((h, w), np.float64)
    for i in range(gy):
        for j in range(gx):
            if not valid[i, j]:
                continue
            r, c = i * stride, j * stride
            sl = np.s_[r : r + p, c : c + p]
            x = values[i, j].astype(np.float64)
            w_sum[sl] += weight
            mean_old = mean[sl].copy()
            mean[sl] = mean_old + (weight / w_sum[sl]) * (x - mean_old)
            s[sl] += weight * (x - mean_old) * (x - mean[sl])
    good = w_sum > 0
    std = np.sqrt(np.divide(s, w_sum, out=np.zeros_like(s), where=good))
    return mean, std, w_sum, good


class TestBlend:
    def test_gaussian_kernel_matches_reference_formula(self):
        n = 64
        k = gaussian_blend_kernel(n, purge=0)
        x = np.linspace(-n / 2, n / 2, n)
        xx, yy = np.meshgrid(x, x)
        s = n / 5.0
        ref = np.exp(-(xx**2 + yy**2) / (2 * s * s)) / (2 * np.pi * s * s)
        ref = (ref - ref.min()) / (ref.max() - ref.min()) + 1e-7
        np.testing.assert_allclose(k, ref, rtol=1e-5)
        kp = gaussian_blend_kernel(n)
        assert kp.shape == (n - 2 * (n // 16),) * 2

    def test_fold_add_equals_naive(self, rng):
        gy, gx, p, s = 5, 7, 12, 4
        patches = rng.random((gy, gx, p, p)).astype(np.float32)
        got = np.asarray(fold_add(jnp.asarray(patches), s))
        h, w = (gy - 1) * s + p, (gx - 1) * s + p
        want = np.zeros((h, w), np.float32)
        for i in range(gy):
            for j in range(gx):
                want[i * s : i * s + p, j * s : j * s + p] += patches[i, j]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fold_add_stride_divides(self, rng):
        gy, gx, p, s = 4, 4, 8, 4
        patches = rng.random((gy, gx, p, p)).astype(np.float32)
        got = np.asarray(fold_add(jnp.asarray(patches), s))
        h = (gy - 1) * s + p
        want = np.zeros((h, h), np.float32)
        for i in range(gy):
            for j in range(gx):
                want[i * s : i * s + p, j * s : j * s + p] += patches[i, j]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_extract_patches_roundtrip(self, rng):
        plane = rng.random((40, 52)).astype(np.float32)
        got = np.asarray(extract_patches(jnp.asarray(plane), (5, 7), 4, 12))
        for i in range(5):
            for j in range(7):
                np.testing.assert_array_equal(
                    got[i, j], plane[i * 4 : i * 4 + 12, j * 4 : j * 4 + 12]
                )

    def test_weighted_moments_match_reference_welford(self, rng):
        gy, gx, p, s = 6, 6, 16, 8
        values = (rng.random((gy, gx, p, p)) * 10 + 100).astype(np.float32)
        valid = (rng.random((gy, gx)) > 0.2).astype(np.float32)
        weight = gaussian_blend_kernel(p, purge=0)
        mean, std, w_sum, good = fold_weighted_moments(
            jnp.asarray(values), jnp.asarray(valid), jnp.asarray(weight), s
        )
        h = (gy - 1) * s + p
        rm, rs, rw, rg = _reference_welford(values, valid, weight, s, (h, h))
        np.testing.assert_allclose(np.asarray(w_sum), rw, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(good), rg.astype(np.uint8))
        np.testing.assert_allclose(
            np.asarray(mean)[rg], rm[rg], rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(std)[rg], rs[rg], rtol=1e-3, atol=1e-3
        )


def test_weighted_moments_large_offset_stability(rng):
    """Lunar DEM magnitudes (1e3-1e4 m) with cm-scale inter-generation
    variance: the two-pass fold must recover std without catastrophic
    cancellation (the fp32 sufficient-statistics form loses it entirely)."""
    gy = gx = 4
    p, s = 16, 8
    base = 8500.0  # meters
    noise = 0.02   # 2 cm generation-to-generation spread
    values = (base + rng.standard_normal((gy, gx, p, p)) * noise).astype(
        np.float32)
    valid = np.ones((gy, gx), np.float32)
    weight = gaussian_blend_kernel(p, purge=0)
    mean, std, w_sum, good = fold_weighted_moments(
        jnp.asarray(values), jnp.asarray(valid), jnp.asarray(weight), s)
    h = (gy - 1) * s + p
    rm, rs, rw, rg = _reference_welford(
        values, valid, weight, s, (h, h))  # float64 ground truth
    interior = rw > rw.max() * 0.5
    np.testing.assert_allclose(np.asarray(mean)[interior], rm[interior],
                               rtol=1e-6)
    # std: fp32 ULP at 8500 m is ~0.5 mm, so per-pixel deviations up to a
    # few mm are inherent; require the error to stay well under the signal.
    err = np.abs(np.asarray(std)[interior] - rs[interior])
    assert np.sqrt((err**2).mean()) < 0.3 * noise, err.max()
    # and the recovered std magnitude is in the right range (not zeroed out
    # by cancellation, which the single-pass fp32 form suffers)
    assert 0.5 * noise < np.asarray(std)[interior].mean() < 1.5 * noise
