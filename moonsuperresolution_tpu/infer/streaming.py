"""Bounded-memory streaming inference over arbitrarily large rasters.

The in-RAM engine mirrors the reference: both rasters, their padded copies,
and all three output maps live in host memory at once (~27 GB for the
production 15000x70000 pair, process_full_tiles.py:172-175).  This module
processes the same pipeline one tile-row at a time with bounded memory:

- the ortho raster is read in row bands (``TiffReader.read_rows``) and its
  nodata holes filled with the window-exact band sweep
  (``infer/fill.py::fill_nodata_window`` — bit-exact vs the in-RAM sweep);
- the /16 low-res conditioning DEM is synthesized from two streamed /4
  area-downscales (the quarter-res intermediate, 16x smaller, is the only
  full-extent array kept) with the final cubic upsample evaluated per row
  band via explicit cv2-equivalent taps (``ops/resize.py::cubic_taps``);
- output maps stream to disk through ``geo/tiff.py::TiffStreamWriter``
  (strips compressed as tile rows complete — nothing map-sized in RAM).

Peak memory is O(tile_row) ~ a few hundred MB per band plus the quarter-res
DEM, independent of raster height.

Parity notes: identical tile programs and per-tile PRNG keys as the in-RAM
path; the only numeric difference is the cubic upsample (explicit taps in
f32 vs cv2's fixed-point-ish internals), bounded by the op-level parity
tests and the streaming-vs-in-RAM engine test.  Requires raster dimensions
divisible by 4 (integer first-stage area downscale — true of the
production rasters); otherwise use the in-RAM path.
"""

from __future__ import annotations

import os
import time

import numpy as np

from moonsuperresolution_tpu.geo.tiff import TiffReader, TiffStreamWriter
from moonsuperresolution_tpu.infer.fill import fill_nodata, fill_nodata_window
from moonsuperresolution_tpu.ops.resize import (
    resample_cols_banded,
    resample_rows_banded,
)


def _quarter_area_nan(band: np.ndarray) -> np.ndarray:
    """cv2.INTER_AREA /4 on a NaN-masked band (rows % 4 == 0): integer box
    mean, NaN-propagating — identical to the full-raster cv2 call because
    the scale is exactly 4."""
    import cv2

    h, w = band.shape
    return cv2.resize(band, (w // 4, h // 4), interpolation=cv2.INTER_AREA)


def process_map_streaming(engine, progress: bool = True,
                          fill_method: str = "fast") -> dict:
    """Streaming counterpart of ``DEMSuperResolution.process_map`` (single
    shard, single device).  Returns the same stats dict; output maps go
    straight to GeoTIFF (no ``engine.result``)."""
    cfg = engine.cfg
    g = engine.geom
    nv = engine.no_value
    t = cfg.tile_size
    t0 = time.time()

    img_path = os.path.join(cfg.source_folder_path, cfg.ortho_image_name)
    dem_path = os.path.join(cfg.source_folder_path, cfg.dem_name)
    for p in (img_path, dem_path):
        if not os.path.exists(p):
            raise ValueError(f"input raster not found: {p}")

    img_r = TiffReader(img_path)
    dem_r = TiffReader(dem_path)
    h, w = dem_r.height, dem_r.width
    if h % 4 or w % 4:
        raise ValueError(
            f"streaming mode needs raster dims divisible by 4, got {h}x{w}; "
            "use the in-RAM path")
    engine.dem_shape = (h, w)
    engine.geo_transform = dem_r.geo_transform
    engine.projection = dem_r.projection

    # ---- phase A: quarter-res DEM from streamed /4 bands, then the exact
    # in-RAM fill + second /4 on the (16x smaller) intermediates
    # (reference: process_full_tiles.py:406-424 semantics).
    import cv2

    hq, wq = h // 4, w // 4
    quarter = np.empty((hq, wq), np.float32)
    band_rows = 4096
    for y in range(0, h, band_rows):
        y1 = min(h, y + band_rows)
        raw = dem_r.read_rows(y, y1).astype(np.float32)
        raw[raw <= nv] = np.nan
        quarter[y // 4 : y1 // 4] = _quarter_area_nan(raw)
    quarter[np.isnan(quarter)] = nv
    quarter = fill_nodata(quarter, nv, tile_size=256, border=32,
                          max_fill_area=24, method=fill_method,
                          workers=cfg.fill_workers)
    quarter[quarter <= nv] = np.nan
    s16 = cv2.resize(quarter, (0, 0), fx=0.25, fy=0.25,
                     interpolation=cv2.INTER_AREA)
    del quarter

    # ---- geometry (same formulas as pad_inputs)
    halo = g.halo
    new_w = ((w // t) + 1) * t + halo * 2
    t_pre = time.time() - t0

    # ---- output stream writers
    writers = {}
    if cfg.save_path:
        os.makedirs(cfg.save_path, exist_ok=True)

        def mk(name, dtype):
            return TiffStreamWriter(
                os.path.join(cfg.save_path, f"{cfg.map_name}_{name}.tiff"),
                w, h, dtype, engine.geo_transform, engine.projection,
                nodata=nv, compress="lzw",
            )

        writers = {"mean": mk("mean", np.float32),
                   "std": mk("std", np.float32),
                   "good": mk("good", np.uint16)}

    # ---- per-tile-row band pipeline
    n_rows_tiles = len(range(0, h, t))
    tiles_x = list(range(0, ((w // t) + 1) * t, t))
    n_tiles = 0
    t1 = time.time()

    def lr_band(a: int, b: int) -> np.ndarray:
        """Synthesized low-res DEM rows [a, b) (full width)."""
        rows = resample_rows_banded(s16, h, a, b)
        band = resample_cols_banded(rows, w)
        band[np.isnan(band)] = nv
        return band

    for py in range(0, h, t):
        # raster rows this band covers (slab space: [py - halo, py + t + halo))
        a = max(0, py - halo)
        b = min(h, py + t + halo)

        img_band = fill_nodata_window(
            lambda y0, y1: img_r.read_rows(y0, y1).astype(np.float32),
            (h, w), a, b, nv, tile_size=1024, border=128, max_fill_area=8,
            method=fill_method, workers=cfg.fill_workers,
        )
        dem_band = lr_band(a, b)

        # assemble padded band: rows [py - halo, py + t + halo), full width
        band_img = np.full((g.slab, new_w), nv, np.float32)
        band_dem = np.full((g.slab, new_w), nv, np.float32)
        r0 = a - (py - halo)   # offset of first real row inside the band
        band_img[r0 : r0 + (b - a), halo : halo + w] = img_band
        band_dem[r0 : r0 + (b - a), halo : halo + w] = dem_band
        del img_band, dem_band

        mean_row = np.full((t, w), nv, np.float32)
        std_row = np.full((t, w), nv, np.float32)
        good_row = np.zeros((t, w), np.uint8)
        hh = min(t, h - py)

        def provider(px, py_real):
            return (band_img[:, px : px + g.slab],
                    band_dem[:, px : px + g.slab])

        def commit(px, py_real, out):
            mean_t, std_t, good_t = out
            ww = min(t, w - px)
            mean_row[:hh, px : px + ww] = np.asarray(mean_t)[:hh, :ww]
            std_row[:hh, px : px + ww] = np.asarray(std_t)[:hh, :ww]
            good_row[:hh, px : px + ww] = np.asarray(good_t)[:hh, :ww]

        tiles = [(px, py) for px in tiles_x if px < w]
        engine.run_tiles_serial(tiles, commit, progress=False,
                                slab_provider=provider)
        n_tiles += len(tiles)
        if writers:
            writers["mean"].write_rows(mean_row[:hh])
            writers["std"].write_rows(std_row[:hh])
            writers["good"].write_rows(good_row[:hh].astype(np.uint16))
        if progress:
            print(f"tile row {py // t + 1}/{n_rows_tiles}", flush=True)

    t_tiles = time.time() - t1
    t2 = time.time()
    for wr in writers.values():
        wr.close()
    img_r.close()
    dem_r.close()
    t_save = time.time() - t2

    n_patches = n_tiles * g.grid ** 2
    return {
        "tiles": n_tiles,
        "patches": n_patches,
        "preprocess_s": t_pre,
        "tiles_s": t_tiles,
        "save_s": t_save,
        "patches_per_s": n_patches / max(t_tiles, 1e-9),
        "streaming": True,
    }
