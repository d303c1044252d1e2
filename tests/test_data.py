"""Data-layer tests: h5 build + sampler contract + augmentations."""

import os
import pickle

import numpy as np
import pytest

from moonsuperresolution_tpu.data.h5_builder import (
    split_train_val,
    tile_pair,
)
from moonsuperresolution_tpu.data.sampler import (
    BatchPrefetcher,
    SyntheticSampler,
    TileSampler,
    augment_batch,
)


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    """Build a small h5 tile store through the real builder path."""
    h5py = pytest.importorskip("h5py")
    h5_path = str(tmp_path / "tiles.hdf5")
    dct = {}
    ort = (rng.random((2000, 3000)) * 255).astype(np.float32)
    dem = (rng.random((2000, 3000)) * 4000 - 2000).astype(np.float32)
    with h5py.File(h5_path, "w") as h5:
        h5, dct = tile_pair(ort, dem, "R", h5, dct)
    pkl_path = str(tmp_path / "keys.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(dct, f)
    return h5_path, pkl_path, dct


class TestH5Builder:
    def test_tile_layout(self, tiny_dataset):
        import h5py

        h5_path, _, dct = tiny_dataset
        # 2000x3000 at 1000px tiles / 500 offset: 3 x 5 full tiles
        assert len(dct) == 15
        with h5py.File(h5_path, "r") as h5:
            dem_lbl, ort_lbl = dct["R-0-0"]
            assert h5[dem_lbl].shape == (1000, 1000)
            assert h5[dem_lbl].dtype == np.uint16
            assert h5[ort_lbl].shape == (1000, 1000)
            # min-max quantization spans the full uint16 range, no overflow
            assert int(np.asarray(h5[dem_lbl]).max()) == 65535
            assert int(np.asarray(h5[dem_lbl]).min()) == 0

    def test_split(self, rng):
        dct = {f"k{i}": [f"d{i}", f"o{i}"] for i in range(5000)}
        train, val = split_train_val(dct, num_anchors=50, run_length=20, seed=0)
        assert len(train) + len(val) == 5000
        assert 0 < len(val) <= 1000  # anchor runs may overlap


class TestSampler:
    def test_contract(self, tiny_dataset):
        h5_path, pkl_path, _ = tiny_dataset
        s = TileSampler(h5_path, pkl_path, hw=128, upscaling=16, seed=0)
        src, tgt = s.sample(next(iter(s.dataset)))
        assert src.shape == (128, 128, 2) and src.dtype == np.float32
        assert tgt.shape == (128, 128, 1)
        # the model I/O contract: ortho and DEM zero-centered.  Cubic resize
        # overshoots slightly (no clamping, reference behavior), so the
        # ortho bound is loose.
        assert -0.51 <= tgt.min() and tgt.max() <= 0.51
        assert -0.9 <= src[..., 0].min() and src[..., 0].max() <= 0.9
        # low-res channel is a smoothed version of the target
        lr = src[..., 1]
        assert np.abs(lr - tgt[..., 0]).mean() < 0.2

    def test_batches_drop_remainder(self, tiny_dataset):
        h5_path, pkl_path, dct = tiny_dataset
        s = TileSampler(h5_path, pkl_path, hw=64, seed=0)
        batches = list(s.batches(4))
        assert len(batches) == len(dct) // 4
        for x, y in batches:
            assert x.shape == (4, 64, 64, 2) and y.shape == (4, 64, 64, 1)

    def test_synthetic_contract(self):
        s = SyntheticSampler(hw=64, seed=0)
        src, tgt = s.sample()
        assert src.shape == (64, 64, 2) and tgt.shape == (64, 64, 1)
        assert not np.isnan(src).any()

    def test_prefetcher(self):
        items = list(BatchPrefetcher(iter(range(17)), depth=3))
        assert items == list(range(17))


class TestAugment:
    def test_geometry_consistency(self, rng):
        """Rotations/flips must move source and target identically."""
        x = rng.standard_normal((8, 16, 16, 2)).astype(np.float32)
        # make DEM channel equal target so the pairing is checkable
        y = x[..., 1:2].copy()
        xa, ya = augment_batch(x, y, rng)
        np.testing.assert_allclose(xa[..., 1:2], ya, atol=1e-6)

    def test_brightness_only_on_ortho(self, rng):
        x = rng.standard_normal((4, 8, 8, 2)).astype(np.float32)
        y = rng.standard_normal((4, 8, 8, 1)).astype(np.float32)
        fixed = np.random.default_rng(1)
        xa, ya = augment_batch(x.copy(), y.copy(), fixed)
        # geometry with the same seed, to isolate the photometric jitter
        fixed2 = np.random.default_rng(1)
        xb, yb = augment_batch(x.copy(), y.copy(), fixed2)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_build_h5_dataset_end_to_end(tmp_path, rng):
    """Full builder path on synthetic region files (tiny DEM grid)."""
    from moonsuperresolution_tpu.data.h5_builder import (
        DEM_FILES,
        ORT_FILES,
        build_h5_dataset,
    )

    key = "N0-60_W000-120"
    rows, cols = 64, 96
    dem = (rng.random((rows, cols)) * 2000).astype(np.float32)
    dem.tofile(str(tmp_path / DEM_FILES[key]))
    ort = (rng.random((32, 48)) * 255).astype(np.float32)
    np.save(str(tmp_path / ORT_FILES[key]), ort)

    h5_path, n_train, n_val = build_h5_dataset(
        str(tmp_path), str(tmp_path / "out"), regions=[key],
        tile_size=32, tile_offset=16, seed=0, dem_rows=rows,
    )
    import h5py

    with h5py.File(h5_path, "r") as h5:
        # 64x96 at 32px tiles / 16 offset: 3 x 5 full tiles
        dem_keys = [k for k in h5 if "-dem-" in k]
        assert len(dem_keys) == 15
        assert h5[dem_keys[0]].dtype == np.uint16
    assert n_train + n_val == 15
    assert os.path.exists(str(tmp_path / "out" / "MoonORTO2DEM_train.pkl"))


def test_fill_reference_mode(rng):
    """The reference-exact griddata fill mode fills small blobs too."""
    from moonsuperresolution_tpu.infer.fill import interpolate_missing_values

    data = rng.standard_normal((48, 48)).astype(np.float32) + 5
    data[20:23, 20:23] = -32768.0
    out = interpolate_missing_values(data.copy(), -32768.0,
                                     max_fill_area=64, method="reference")
    assert (out[20:23, 20:23] > -100).all()
