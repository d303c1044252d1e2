"""Nodata hole filling for input rasters (host-side preprocessing).

Reimplements the reference's small-blob interpolation
(process_full_tiles.py:364-424): connected nodata components below a size
threshold are filled by interpolation from the valid pixels; larger holes are
left as nodata (and later rejected at the patch level).

Two modes:
- ``method="reference"``: cubic griddata over *all* valid points of the tile,
  the reference's exact behavior — accurate but very slow on big tiles.
- ``method="fast"`` (default): interpolation restricted to a dilated
  neighbourhood of each hole.  Orders of magnitude faster with visually
  identical fills for the small blobs this path is meant for.
"""

from __future__ import annotations

import numpy as np


def interpolate_missing_values(
    data: np.ndarray,
    no_value: float,
    max_fill_area: int = 256,
    method: str = "fast",
) -> np.ndarray:
    """Fill nodata blobs smaller than ``max_fill_area`` px in-place-ish.

    Mirrors process_full_tiles.py:364-392: early-out when there are no
    missing values or no valid values; blobs >= max_fill_area are kept as
    nodata.
    """
    import cv2
    from scipy import interpolate as si

    invalid = data <= no_value
    if not invalid.any():
        return data
    if invalid.all():
        return data
    n_blobs, labels = cv2.connectedComponents((invalid * 255).astype(np.uint8))
    ids, counts = np.unique(labels, return_counts=True)
    fill_ids = [i for i, c in zip(ids, counts) if c < max_fill_area and i != 0]
    # Blob id 0 is the valid background; if every hole is too large, skip.
    if not fill_ids:
        return data
    fill_mask = np.isin(labels, fill_ids) & invalid

    if method == "reference":
        yy, xx = np.mgrid[0 : data.shape[0], 0 : data.shape[1]]
        pts = np.stack([xx[~invalid], yy[~invalid]], -1)
        vals = data[~invalid].ravel()
        interp = si.griddata(
            pts, vals, (xx, yy), method="cubic"
        )
        data = data.copy()
        data[fill_mask] = interp[fill_mask]
        return data

    # fast path: per-hole local interpolation
    data = data.copy()
    kernel = np.ones((3, 3), np.uint8)
    for blob_id in fill_ids:
        hole = labels == blob_id
        ys, xs = np.where(hole)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        pad = 8
        y0, x0 = max(0, y0 - pad), max(0, x0 - pad)
        y1 = min(data.shape[0], y1 + pad)
        x1 = min(data.shape[1], x1 + pad)
        sub = data[y0:y1, x0:x1]
        sub_hole = hole[y0:y1, x0:x1]
        sub_valid = ~(sub <= no_value)
        ring = cv2.dilate(sub_hole.astype(np.uint8), kernel, iterations=pad)
        src = sub_valid & (ring > 0)
        if src.sum() < 4:
            continue
        syy, sxx = np.mgrid[0 : sub.shape[0], 0 : sub.shape[1]]
        pts = np.stack([sxx[src], syy[src]], -1)
        try:
            filled = si.griddata(
                pts, sub[src].ravel(),
                (sxx[sub_hole], syy[sub_hole]), method="cubic",
            )
        except Exception:
            filled = None
        if filled is None or np.isnan(filled).any():
            filled = si.griddata(
                pts, sub[src].ravel(),
                (sxx[sub_hole], syy[sub_hole]), method="nearest",
            )
        sub[sub_hole] = filled
        data[y0:y1, x0:x1] = sub
    return data


def fill_nodata_window(
    read_rows,
    shape: tuple,
    a: int,
    b: int,
    no_value: float,
    tile_size: int = 1024,
    border: int = 128,
    max_fill_area: int = 256,
    method: str = "fast",
    workers: int = 1,
) -> np.ndarray:
    """Rows [a, b) of ``fill_nodata`` applied to a raster streamed via
    ``read_rows(y0, y1) -> [y1-y0, W]`` — bit-exact with the in-RAM sweep.

    The full-raster sweep fills each bordered tile purely from the
    *original* rows, so any band of output rows depends only on the raw
    rows of the fill tiles whose written interiors intersect it.  Rows
    outside every tile interior (the global top/bottom ``border`` rows)
    pass through unchanged, exactly like ``fill_nodata``.
    """
    H, W = shape
    stride = tile_size - border * 2
    tile_ys = [
        y for y in range(0, H, stride)
        if y + border < b and min(y + tile_size - border, H - border) > a
    ]
    ra = min(min(tile_ys), a) if tile_ys else a
    rb = max(max(y + tile_size for y in tile_ys), b) if tile_ys else b
    rb = min(rb, H)
    raw = np.asarray(read_rows(ra, rb))
    out = raw[a - ra : b - ra].copy()

    jobs = []  # holed tiles whose written interior intersects [a, b)
    for y in tile_ys:
        ymax = min(y + tile_size - border, H - border)
        for x in range(0, W, stride):
            xmax = min(x + tile_size - border, W - border)
            # interior rows of this tile, clipped to the requested band
            w0, w1 = max(y + border, a), min(ymax, b)
            if w0 >= w1:
                continue
            tile = raw[y - ra : y - ra + tile_size, x : x + tile_size]
            if not (tile <= no_value).any():
                continue
            jobs.append((y, x, xmax, w0, w1))

    def commit(y, x, xmax, w0, w1, filled):
        out[w0 - a : w1 - a, x + border : xmax] = filled[
            w0 - y : w1 - y,
            border : border + max(0, xmax - x - border),
        ]

    import os

    if workers == 0:
        workers = os.cpu_count() or 1
    if workers <= 1 or len(jobs) < 2:
        for y, x, xmax, w0, w1 in jobs:
            filled = interpolate_missing_values(
                raw[y - ra : y - ra + tile_size, x : x + tile_size].copy(),
                no_value, max_fill_area=max_fill_area, method=method,
            )
            commit(y, x, xmax, w0, w1, filled)
        return out

    # Independent tiles: fill them in a process pool, same as the in-RAM
    # sweep (scipy griddata holds the GIL-heavy work in C but the per-blob
    # Python loop dominates on many-hole tiles).
    import concurrent.futures

    with concurrent.futures.ProcessPoolExecutor(
        max_workers=min(workers, len(jobs))
    ) as pool:
        futs = {
            pool.submit(
                _fill_one,
                (raw[y - ra : y - ra + tile_size, x : x + tile_size].copy(),
                 no_value, max_fill_area, method),
            ): (y, x, xmax, w0, w1)
            for y, x, xmax, w0, w1 in jobs
        }
        for fut in concurrent.futures.as_completed(futs):
            y, x, xmax, w0, w1 = futs[fut]
            commit(y, x, xmax, w0, w1, fut.result())
    return out


def _fill_one(args):
    tile, no_value, max_fill_area, method = args
    return interpolate_missing_values(
        tile, no_value, max_fill_area=max_fill_area, method=method
    )


def fill_nodata(
    image: np.ndarray,
    no_value: float,
    tile_size: int = 1024,
    border: int = 128,
    max_fill_area: int = 256,
    method: str = "fast",
    workers: int = 0,
) -> np.ndarray:
    """Bordered tile sweep of ``interpolate_missing_values`` over a large
    raster (process_full_tiles.py:394-404): each tile is interpolated with
    ``border`` px of context, only the interior is written back.

    Tiles are independent, so with ``workers`` > 1 (or 0 = one per CPU) the
    holed tiles are filled by a process pool — on a production host this is
    the difference between preprocessing dominating the full-map wall clock
    and staying under ~20% of it (the reference fills serially,
    process_full_tiles.py:394-404).
    """
    import os

    if workers == 0:
        workers = os.cpu_count() or 1

    new_image = image.copy()
    stride = tile_size - border * 2

    jobs = []  # (y, x, ymax, xmax) of holed tiles
    for y in range(0, image.shape[0], stride):
        ymax = min(y + tile_size - border, image.shape[0] - border)
        for x in range(0, image.shape[1], stride):
            xmax = min(x + tile_size - border, image.shape[1] - border)
            tile = image[y : y + tile_size, x : x + tile_size]
            if not (tile <= no_value).any():
                continue
            jobs.append((y, x, ymax, xmax))

    def commit(y, x, ymax, xmax, filled):
        new_image[y + border : ymax, x + border : xmax] = filled[
            border : border + max(0, ymax - y - border),
            border : border + max(0, xmax - x - border),
        ]

    if workers <= 1 or len(jobs) < 2:
        for y, x, ymax, xmax in jobs:
            filled = interpolate_missing_values(
                image[y : y + tile_size, x : x + tile_size].copy(),
                no_value, max_fill_area=max_fill_area, method=method,
            )
            commit(y, x, ymax, xmax, filled)
        return new_image

    import concurrent.futures

    with concurrent.futures.ProcessPoolExecutor(
        max_workers=min(workers, len(jobs))
    ) as pool:
        futs = {
            pool.submit(
                _fill_one,
                (image[y : y + tile_size, x : x + tile_size].copy(),
                 no_value, max_fill_area, method),
            ): (y, x, ymax, xmax)
            for y, x, ymax, xmax in jobs
        }
        for fut in concurrent.futures.as_completed(futs):
            y, x, ymax, xmax = futs[fut]
            commit(y, x, ymax, xmax, fut.result())
    return new_image
