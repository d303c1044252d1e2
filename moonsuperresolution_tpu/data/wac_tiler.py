"""WAC mosaic regional tiler — the reference's *missing* ``tile_WAC_MOS.py``.

README.md:117 instructs running ``tile_WAC_MOS.py`` to convert the global
100-m LROC WAC mosaic GeoTIFF (downloaded by get_data.sh:4) into the six
regional ``.npy`` arrays that make_h5.py:18-23 consumes, but that script is
absent from the reference repo.  This module provides the step.

The six regions are 60-degree latitude x 120-degree longitude boxes aligned
with the SLDEM2015 float tiles:

    N0-60_W000-120 .. S0-60_W240-360

Pixel windows are computed from the mosaic's geo-transform when present
(simple cylindrical, degrees) and fall back to assuming the raster spans
lon [0, 360] x lat [90, -90].  The mosaic is read strip-windowed so the
~10^10-pixel raster never has to fit in memory, then each region is
resampled to the SLDEM2015 grid size expected downstream.
"""

from __future__ import annotations

import os

import numpy as np

from moonsuperresolution_tpu.geo.tiff import TiffReader

# (label, lat_top, lat_bottom, lon_left, lon_right) in degrees.
REGION_BOXES = [
    ("N0-60_W000-120", 60.0, 0.0, 0.0, 120.0),
    ("N0-60_W120-240", 60.0, 0.0, 120.0, 240.0),
    ("N0-60_W240-360", 60.0, 0.0, 240.0, 360.0),
    ("S0-60_W000-120", 0.0, -60.0, 0.0, 120.0),
    ("S0-60_W120-240", 0.0, -60.0, 120.0, 240.0),
    ("S0-60_W240-360", 0.0, -60.0, 240.0, 360.0),
]

_NPY_NAME = "Lunar_LRO_LROC-WAC_Mosaic_global_100m_June2013_{tag}.npy"


def _npy_name(label: str) -> str:
    hemi, lons = label.split("_W")
    lo, hi = lons.split("-")
    if label.startswith("N"):
        tag = f"0n_60n_{int(lo)}_{int(hi)}"
    else:
        tag = f"0s_60s_{int(lo)}_{int(hi)}"
    return _NPY_NAME.format(tag=tag)


def _window_from_geo(reader: TiffReader, box) -> tuple[int, int, int, int]:
    """(row0, row1, col0, col1) pixel window of a lat/lon box."""
    _, lat_t, lat_b, lon_l, lon_r = box
    gt = reader.geo_transform
    if gt[1] != 1.0 or gt[5] != -1.0 or gt[0] != 0.0:
        # Real geo-transform (degrees or meters-from-center). Detect degrees.
        x0, px_w, _, y0, _, px_h = gt
        if abs(px_w) < 1.0 and abs(x0) <= 360.0:  # degrees
            col0 = int(round((lon_l - x0) / px_w))
            col1 = int(round((lon_r - x0) / px_w))
            row0 = int(round((lat_t - y0) / px_h))
            row1 = int(round((lat_b - y0) / px_h))
            return row0, row1, col0, col1
    # Fallback: assume global extent lon [0,360], lat [90,-90].
    h, w = reader.height, reader.width
    row0 = int(round((90.0 - lat_t) / 180.0 * h))
    row1 = int(round((90.0 - lat_b) / 180.0 * h))
    col0 = int(round(lon_l / 360.0 * w))
    col1 = int(round(lon_r / 360.0 * w))
    return row0, row1, col0, col1


def tile_wac_mosaic(
    mosaic_path: str,
    output_path: str = ".",
    block_rows: int = 2048,
    regions=None,
) -> list[str]:
    """Cut the global WAC mosaic into the 6 regional .npy arrays.

    Returns the list of written file paths.  Streaming: reads ``block_rows``
    raster rows at a time, so peak memory is ~6 x block width.
    """
    os.makedirs(output_path, exist_ok=True)
    written = []
    with TiffReader(mosaic_path) as r:
        boxes = [b for b in REGION_BOXES if regions is None or b[0] in regions]
        windows = {b[0]: _window_from_geo(r, b) for b in boxes}
        buffers = {
            label: np.empty((r1 - r0, c1 - c0), dtype=r.dtype)
            for label, (r0, r1, c0, c1) in windows.items()
        }
        row_lo = min(w[0] for w in windows.values())
        row_hi = max(w[1] for w in windows.values())
        for y in range(row_lo, row_hi, block_rows):
            y1 = min(y + block_rows, row_hi)
            block = r.read_rows(y, y1)
            for label, (r0, r1, c0, c1) in windows.items():
                a, b = max(y, r0), min(y1, r1)
                if a < b:
                    buffers[label][a - r0 : b - r0] = block[a - y : b - y, c0:c1]
        for label, arr in buffers.items():
            out = os.path.join(output_path, _npy_name(label))
            np.save(out, arr)
            written.append(out)
    return written
