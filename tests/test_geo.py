"""GeoTIFF I/O tests: roundtrips, predictors, compression, interop."""

import os

import numpy as np
import pytest

from moonsuperresolution_tpu.geo import lzw
from moonsuperresolution_tpu.geo.tiff import (
    TiffReader,
    read_geotiff,
    write_geotiff,
)


class TestLZW:
    CASES = [
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT" * 100,
        bytes(range(256)) * 50,
    ]

    def test_roundtrip_python(self):
        for d in self.CASES:
            assert lzw._decode_py(lzw._encode_py(d), len(d)) == d

    def test_roundtrip_native(self):
        if lzw._native_lib() is None:
            pytest.skip("no compiler for native codec")
        for d in self.CASES:
            assert lzw.decode(lzw.encode(d), len(d)) == d

    def test_cross_decode(self):
        for d in self.CASES:
            enc = lzw.encode(d)
            assert lzw._decode_py(enc, len(d)) == d

    def test_table_overflow_clear(self, rng):
        # enough entropy to exhaust the 12-bit table and force Clear codes
        d = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
        assert lzw.decode(lzw.encode(d), len(d)) == d


class TestGeoTiff:
    GT = (12.5, 2.0, 0.0, -7.25, 0.0, -2.0)

    @pytest.mark.parametrize("dtype,comp", [
        (np.float32, "lzw"), (np.uint16, "lzw"), (np.uint8, "deflate"),
        (np.float32, "none"), (np.float64, "lzw"), (np.int16, "lzw"),
    ])
    def test_roundtrip(self, tmp_path, rng, dtype, comp):
        x = (rng.random((137, 251)) * 1000).astype(dtype)
        p = str(tmp_path / "t.tif")
        write_geotiff(p, x, self.GT, projection="WKT", nodata=-32768.0,
                      compress=comp)
        g = read_geotiff(p)
        np.testing.assert_array_equal(g.data.squeeze(), x)
        assert g.geo_transform == self.GT
        assert g.projection == "WKT"
        assert g.nodata == -32768.0

    def test_multiband(self, tmp_path, rng):
        x = (rng.random((64, 80, 3)) * 100).astype(np.float32)
        p = str(tmp_path / "mb.tif")
        write_geotiff(p, x)
        np.testing.assert_array_equal(read_geotiff(p).data, x)

    def test_bigtiff(self, tmp_path, rng):
        x = rng.random((300, 400)).astype(np.float32)
        p = str(tmp_path / "big.tif")
        write_geotiff(p, x, bigtiff=True)
        np.testing.assert_array_equal(read_geotiff(p).data.squeeze(), x)

    def test_windowed_read(self, tmp_path, rng):
        x = rng.random((300, 400)).astype(np.float32)
        p = str(tmp_path / "w.tif")
        write_geotiff(p, x)
        with TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_rows(37, 129), x[37:129])
            np.testing.assert_array_equal(r.read_rows(0, 1), x[:1])
            np.testing.assert_array_equal(r.read_rows(299, 300), x[299:])

    def test_libtiff_interop(self, tmp_path, rng):
        """Cross-implementation check: libtiff (via cv2) must decode our
        LZW+predictor output bit-exactly, and vice versa."""
        cv2 = pytest.importorskip("cv2")
        x = (rng.random((100, 130)) * 1000).astype(np.float32)
        p = str(tmp_path / "i.tif")
        write_geotiff(p, x, compress="lzw")
        y = cv2.imread(p, -1)
        assert y is not None
        np.testing.assert_array_equal(y, x)
        cv2.imwrite(p, x)
        np.testing.assert_array_equal(read_geotiff(p).data.squeeze(), x)


class TestWacTiler:
    def test_regions_from_synthetic_mosaic(self, tmp_path, rng):
        from moonsuperresolution_tpu.data.wac_tiler import tile_wac_mosaic

        # Tiny "global" mosaic: 36 rows (5 deg/px), 72 cols
        h, w = 36, 72
        mosaic = rng.integers(0, 255, (h, w), dtype=np.uint8)
        # lon [0,360], lat [90,-90] geo-transform, 5 deg pixels
        gt = (0.0, 5.0, 0.0, 90.0, 0.0, -5.0)
        p = str(tmp_path / "wac.tif")
        write_geotiff(p, mosaic, gt)
        out = tile_wac_mosaic(p, str(tmp_path), block_rows=7)
        assert len(out) == 6
        north = np.load(str(
            tmp_path / "Lunar_LRO_LROC-WAC_Mosaic_global_100m_June2013_0n_60n_0_120.npy"))
        # N0-60 x W0-120: rows for lat 60..0 = rows 6..18, cols 0..24
        np.testing.assert_array_equal(north, mosaic[6:18, 0:24])
        south = np.load(str(
            tmp_path / "Lunar_LRO_LROC-WAC_Mosaic_global_100m_June2013_0s_60s_240_360.npy"))
        np.testing.assert_array_equal(south, mosaic[18:30, 48:72])


class TestTiledTiff:
    def test_tiled_organization_read(self, tmp_path, rng):
        """Tile-organized TIFFs (the layout of the real WAC global mosaic)
        decode correctly, full and windowed."""
        import array
        import struct

        data = (rng.random((50, 70)) * 100).astype(np.float32)
        tile = 16
        h, w = data.shape
        ta, td = -(-w // tile), -(-h // tile)
        tiles = []
        for i in range(td):
            for j in range(ta):
                blk = np.zeros((tile, tile), data.dtype)
                ys = data[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile]
                blk[:ys.shape[0], :ys.shape[1]] = ys
                tiles.append(blk.tobytes())
        p = str(tmp_path / "tiled.tif")
        with open(p, "wb") as f:
            f.write(struct.pack("<2sHI", b"II", 42, 8))
            offs = []
            for t in tiles:
                offs.append(f.tell())
                f.write(t)
            off_pos = f.tell()
            f.write(array.array("I", offs).tobytes())
            cnt_pos = f.tell()
            f.write(array.array("I", [len(t) for t in tiles]).tobytes())
            tags = [(256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [32]),
                    (259, 3, 1, [1]), (262, 3, 1, [1]), (277, 3, 1, [1]),
                    (284, 3, 1, [1]), (339, 3, 1, [3]),
                    (322, 4, 1, [tile]), (323, 4, 1, [tile]),
                    (324, 4, len(offs), None), (325, 4, len(tiles), None)]
            tags.sort()
            ifd = f.tell()
            f.write(struct.pack("<H", len(tags)))
            for tag, ft, cnt, vals in tags:
                f.write(struct.pack("<HHI", tag, ft, cnt))
                if tag == 324:
                    f.write(struct.pack("<I", off_pos))
                elif tag == 325:
                    f.write(struct.pack("<I", cnt_pos))
                else:
                    fmt = {3: "H", 4: "I"}[ft]
                    f.write(struct.pack(f"<{cnt}{fmt}", *vals).ljust(4, b"\0"))
            f.write(struct.pack("<I", 0))
            f.seek(4)
            f.write(struct.pack("<I", ifd))
        with TiffReader(p) as r:
            assert r.tiled
            np.testing.assert_array_equal(r.read(), data)
            np.testing.assert_array_equal(r.read_rows(13, 37), data[13:37])


def test_big_endian_read(tmp_path):
    """MM (big-endian) TIFFs decode correctly (sample byte-swap before any
    predictor, matching libtiff's swab-then-predict order)."""
    import struct

    data = (np.arange(48, dtype=np.uint16).reshape(6, 8) * 100)
    p = str(tmp_path / "be.tif")
    with open(p, "wb") as f:
        f.write(struct.pack(">2sHI", b"MM", 42, 8))
        payload = data.astype(">u2").tobytes()
        tags = [(256, 3, 1, 8), (257, 3, 1, 6), (258, 3, 1, 16),
                (259, 3, 1, 1), (262, 3, 1, 1), (277, 3, 1, 1),
                (278, 3, 1, 6), (273, 4, 1, None),
                (279, 4, 1, len(payload)), (339, 3, 1, 1)]
        tags.sort()
        data_off = 8 + 2 + len(tags) * 12 + 4
        f.write(struct.pack(">H", len(tags)))
        for tag, ft, cnt, val in tags:
            if tag == 273:
                val = data_off
            f.write(struct.pack(">HHI", tag, ft, cnt))
            f.write(struct.pack(">H", val) + b"\0\0" if ft == 3
                    else struct.pack(">I", val))
        f.write(struct.pack(">I", 0))
        f.write(payload)
    with TiffReader(p) as r:
        np.testing.assert_array_equal(r.read(), data)


def test_stream_writer_matches_batch_writer(tmp_path, rng):
    """TiffStreamWriter (incremental strips, IFD at close) must produce a
    file that reads back identically to write_geotiff's, across dtypes,
    ragged write sizes, and geo metadata."""
    from moonsuperresolution_tpu.geo.tiff import TiffStreamWriter, write_geotiff

    GT = (30.5, 2.0, 0.0, -10.25, 0.0, -2.0)
    for dtype, h, w in [(np.float32, 333, 217), (np.uint16, 97, 512)]:
        data = (rng.standard_normal((h, w)) * 100).astype(dtype)
        a_path = str(tmp_path / f"a_{np.dtype(dtype).name}.tif")
        b_path = str(tmp_path / f"b_{np.dtype(dtype).name}.tif")
        write_geotiff(a_path, data, GT, "P", -1.0)
        with TiffStreamWriter(b_path, w, h, dtype, GT, "P", -1.0) as sw:
            i = 0
            for step in (1, 7, 50, 100):
                sw.write_rows(data[i : i + step])
                i += step
            while i < h:
                sw.write_rows(data[i : i + 64])
                i += min(64, h - i)
        with TiffReader(a_path) as ra, TiffReader(b_path) as rb:
            np.testing.assert_array_equal(ra.read(), rb.read())
            assert ra.geo_transform == rb.geo_transform
            assert ra.projection == rb.projection
            assert ra.nodata == rb.nodata

    # short write is an error at close
    sw = TiffStreamWriter(str(tmp_path / "short.tif"), 8, 10, np.float32)
    sw.write_rows(np.zeros((4, 8), np.float32))
    with pytest.raises(ValueError, match="declared"):
        sw.close()
