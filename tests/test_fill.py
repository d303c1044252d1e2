"""Nodata-fill equivalence: the default ``fast`` mode (neighbourhood-
restricted griddata) vs the reference-exact ``reference`` mode (whole-tile
cubic griddata, process_full_tiles.py:184-212).

The headline benchmarks run with ``fast`` (the default); this test bounds the
deviation on production-like holed tiles so that choice is quantified, not
asserted.  Terrain model: smooth low-frequency surface + correlated noise,
the same construction as the engine tests' synthetic DEMs.
"""

import numpy as np
import pytest

from moonsuperresolution_tpu.infer.fill import (
    fill_nodata,
    interpolate_missing_values,
)

NODATA = -32768.0


def _terrain(rng, h=256, w=256):
    cv2 = pytest.importorskip("cv2")
    base = cv2.resize(rng.standard_normal((8, 8)).astype(np.float32), (w, h),
                      interpolation=cv2.INTER_CUBIC) * 120 + 1500
    detail = cv2.resize(rng.standard_normal((64, 64)).astype(np.float32),
                        (w, h), interpolation=cv2.INTER_CUBIC) * 6
    return base + detail


def _punch_holes(dem, rng, n=12, max_r=4):
    """Small irregular nodata blobs (< the engine's max_fill_area budgets)."""
    holed = dem.copy()
    holes = np.zeros(dem.shape, bool)
    h, w = dem.shape
    for _ in range(n):
        cy = int(rng.integers(10, h - 10))
        cx = int(rng.integers(10, w - 10))
        r = int(rng.integers(1, max_r + 1))
        yy, xx = np.ogrid[-r : r + 1, -r : r + 1]
        blob = (yy * yy + xx * xx) <= r * r
        holed[cy - r : cy + r + 1, cx - r : cx + r + 1][blob] = NODATA
        holes[cy - r : cy + r + 1, cx - r : cx + r + 1][blob] = True
    return holed, holes


class TestFastVsReferenceFill:
    def test_filled_pixel_rmse_bounded(self, rng):
        """On production-like terrain, fast and reference fills agree to a
        tiny fraction of the DEM's dynamic range on the filled pixels."""
        dem = _terrain(rng)
        holed, holes = _punch_holes(dem, rng)

        fast = interpolate_missing_values(holed.copy(), NODATA,
                                          max_fill_area=64, method="fast")
        ref = interpolate_missing_values(holed.copy(), NODATA,
                                         max_fill_area=64,
                                         method="reference")
        assert (fast[holes] > NODATA).all()
        assert (ref[holes] > NODATA).all()
        span = float(dem.max() - dem.min())
        rmse = float(np.sqrt(np.mean((fast[holes] - ref[holes]) ** 2)))
        # Measured: 2.06 m on a 543 m span (0.38%) — the neighbourhood
        # restriction changes cubic extrapolation inside holes.  Bound the
        # per-filled-pixel deviation at 1% of span, and the *map-level*
        # contribution (filled pixels are a tiny fraction of the raster) at
        # 0.05% of span — far inside the 0.5% whole-DEM fidelity budget
        # (BASELINE.md north star).
        assert rmse < 1e-2 * span, (rmse, span)
        map_rmse = float(np.sqrt(np.mean((fast - ref) ** 2)))
        assert map_rmse < 5e-4 * span, (map_rmse, span)
        # Untouched pixels are identical in both modes.
        np.testing.assert_array_equal(fast[~holes], ref[~holes])

    def test_fill_accuracy_vs_truth(self, rng):
        """Both modes reconstruct the true (smooth) surface closely; fast is
        not meaningfully worse than reference."""
        dem = _terrain(rng)
        holed, holes = _punch_holes(dem, rng)
        fast = interpolate_missing_values(holed.copy(), NODATA,
                                          max_fill_area=64, method="fast")
        ref = interpolate_missing_values(holed.copy(), NODATA,
                                         max_fill_area=64,
                                         method="reference")
        err_fast = float(np.sqrt(np.mean((fast[holes] - dem[holes]) ** 2)))
        err_ref = float(np.sqrt(np.mean((ref[holes] - dem[holes]) ** 2)))
        # Measured: ref 1.60 m, fast comparable, on terrain with +-6 m
        # high-frequency detail.  The claim under test is relative: the
        # fast mode is not meaningfully worse than the reference fill.
        assert err_ref < 3.0, err_ref
        assert err_fast < max(2 * err_ref, 1.0), (err_fast, err_ref)

    def test_tile_sweep_modes_agree(self, rng):
        """fill_nodata (bordered tile sweep) with both methods, same bound."""
        dem = _terrain(rng, h=200, w=300)
        holed, holes = _punch_holes(dem, rng, n=6)
        fast = fill_nodata(holed, NODATA, tile_size=128, border=16,
                           max_fill_area=64, method="fast", workers=1)
        ref = fill_nodata(holed, NODATA, tile_size=128, border=16,
                          max_fill_area=64, method="reference", workers=1)
        span = dem.max() - dem.min()
        filled = holes & (fast > NODATA) & (ref > NODATA)
        assert filled.sum() > 0
        rmse = float(np.sqrt(np.mean((fast[filled] - ref[filled]) ** 2)))
        # same bounds as test_filled_pixel_rmse_bounded (measured 2.4 m)
        assert rmse < 1e-2 * span, (rmse, span)
        map_rmse = float(np.sqrt(np.mean((fast - ref) ** 2)))
        assert map_rmse < 5e-4 * span, (map_rmse, span)
