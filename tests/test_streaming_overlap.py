"""IncrementalLrSynth (the overlapped streaming preprocess) must be
bit-exact with the sequential phase-A build it replaces: streamed /4
INTER_AREA -> bordered-tile nodata fill -> /4 INTER_AREA
(reference semantics: process_full_tiles.py:226-244)."""

import numpy as np
import pytest

from moonsuperresolution_tpu.infer.fill import fill_nodata
from moonsuperresolution_tpu.infer.lr_synth import IncrementalLrSynth

NODATA = -32768.0


class _ArrayReader:
    """TiffReader stand-in over an in-memory raster."""

    def __init__(self, data):
        self.data = data

    def read_rows(self, y0, y1):
        return self.data[y0:y1]


def _sequential_s16(dem, nv, fill_method="fast"):
    """The pre-overlap phase-A construction, verbatim."""
    import cv2

    h, w = dem.shape
    raw = dem.astype(np.float32).copy()
    raw[raw <= nv] = np.nan
    quarter = cv2.resize(raw, (w // 4, h // 4),
                         interpolation=cv2.INTER_AREA)
    quarter[np.isnan(quarter)] = nv
    quarter = fill_nodata(quarter, nv, tile_size=256, border=32,
                          max_fill_area=24, method=fill_method, workers=1)
    quarter[quarter <= nv] = np.nan
    return cv2.resize(quarter, (0, 0), fx=0.25, fy=0.25,
                      interpolation=cv2.INTER_AREA)


def _terrain(rng, h, w, holes=True):
    cv2 = pytest.importorskip("cv2")
    dem = cv2.resize(rng.standard_normal((8, 8)).astype(np.float32), (w, h),
                     interpolation=cv2.INTER_CUBIC) * 100 + 1500
    if holes:
        # small fillable blobs + one large hole that stays nodata
        for _ in range(8):
            cy = int(rng.integers(5, h - 8))
            cx = int(rng.integers(5, w - 8))
            dem[cy : cy + 3, cx : cx + 3] = NODATA
        dem[h // 3 : h // 3 + h // 5, w // 3 : w // 3 + w // 5] = NODATA
    return dem


@pytest.mark.parametrize("h,w,chunk", [
    (296, 420, 4096),    # single chunk, hq=74 (h16 rounds down, no tail)
    (300, 420, 128),     # hq=75 -> 3-row tail output row (h16=19)
    (2048, 424, 256),    # many chunks; fill tiles run incrementally
    (120, 416, 64),      # hq=30 -> 2-row tail (production-raster shape
                         # class, hq%4==2: the cv2 fx call would compute an
                         # empty output for the tail band — regression)
    (120, 440, 64),      # + column tail too (wq=110 -> w16=28)
])
def test_incremental_matches_sequential(rng, h, w, chunk):
    dem = _terrain(rng, h, w)
    want = _sequential_s16(dem, NODATA)
    synth = IncrementalLrSynth(_ArrayReader(dem), h, w, NODATA,
                               workers=1, chunk_rows=chunk)
    synth.join()
    assert synth.s16.shape == want.shape, (synth.s16.shape, want.shape)
    assert (synth.h16, synth.w16) == want.shape
    np.testing.assert_array_equal(np.isnan(synth.s16), np.isnan(want))
    both = ~np.isnan(want)
    # Full 4-row groups publish through the same cv2 fast path as the
    # global call -> bitwise; a partial (<4-row) tail group is built with
    # numpy clipped-box means (cv2's boundary normalization, within ~1 ulp
    # of cv2's own summation order).
    nf = min(synth.h16, (h // 4) // 4)
    np.testing.assert_array_equal(synth.s16[:nf][both[:nf]],
                                  want[:nf][both[:nf]])
    if synth.h16 > nf:
        np.testing.assert_allclose(synth.s16[nf:][both[nf:]],
                                   want[nf:][both[nf:]], rtol=2e-6)


def test_wait_rows_progressive(rng):
    """wait_rows returns as soon as the requested rows are published (and
    join surfaces the final watermark == h16)."""
    h, w = 2048, 424
    dem = _terrain(rng, h, w, holes=False)
    synth = IncrementalLrSynth(_ArrayReader(dem), h, w, NODATA,
                               workers=1, chunk_rows=256)
    synth.wait_rows(4)           # blocks until the first rows publish
    assert synth._ready16 >= 4
    synth.join()
    assert synth._ready16 == synth.h16


def test_producer_error_propagates():
    class _Boom:
        def read_rows(self, y0, y1):
            raise RuntimeError("disk on fire")

    synth = IncrementalLrSynth(_Boom(), 64, 64, NODATA, workers=1,
                               chunk_rows=64)
    with pytest.raises(RuntimeError, match="disk on fire"):
        synth.wait_rows(1)
