"""Fidelity comparison between two DEM GeoTIFFs.

The BASELINE.md north star is <0.5% DEM RMSE deviation versus the TF
reference's outputs; this tool computes that number (plus bias/max-error
stats) over the mutually valid region of two rasters:

    python -m moonsuperresolution_tpu.cli.compare_maps \
        --a ours_mean.tiff --b reference_mean.tiff [--nodata -32768]

Prints one JSON line with rmse, rmse_pct_of_range, bias, max_abs, coverage.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def compare(a: np.ndarray, b: np.ndarray, nodata: float) -> dict:
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    valid = (a > nodata) & (b > nodata) & np.isfinite(a) & np.isfinite(b)
    if not valid.any():
        return {"coverage": 0.0}
    da = a[valid].astype(np.float64)
    db = b[valid].astype(np.float64)
    diff = da - db
    rng = max(db.max() - db.min(), 1e-12)
    return {
        "rmse": float(np.sqrt((diff**2).mean())),
        "rmse_pct_of_range": float(np.sqrt((diff**2).mean()) / rng * 100),
        "bias": float(diff.mean()),
        "max_abs": float(np.abs(diff).max()),
        "coverage": float(valid.mean()),
        "range_b": float(rng),
    }


def main():
    from moonsuperresolution_tpu.geo import read_geotiff

    p = argparse.ArgumentParser("DEM map comparison")
    p.add_argument("--a", required=True, help="candidate GeoTIFF")
    p.add_argument("--b", required=True, help="reference GeoTIFF")
    p.add_argument("--nodata", type=float, default=-32768.0)
    args = p.parse_args()
    ga = read_geotiff(args.a)
    gb = read_geotiff(args.b)
    print(json.dumps(compare(ga.data.squeeze(), gb.data.squeeze(),
                             args.nodata)))


if __name__ == "__main__":
    main()
