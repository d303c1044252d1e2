"""End-to-end inference-engine tests with the identity model — the
reference's own pipeline-fidelity trick (process_full_tiles.py:309-323)."""

import os

import numpy as np
import pytest

from moonsuperresolution_tpu.config import DSRConfig
from moonsuperresolution_tpu.geo import read_geotiff, write_geotiff
from moonsuperresolution_tpu.infer import DEMSuperResolution

GT = (30.5, 2.0, 0.0, -10.25, 0.0, -2.0)


def _synthetic_pair(tmp_path, rng, h=300, w=420, nodata=-32768.0,
                    holes=False):
    cv2 = pytest.importorskip("cv2")
    dem = cv2.resize(rng.standard_normal((6, 8)).astype(np.float32), (w, h),
                     interpolation=cv2.INTER_CUBIC) * 100 + 1500
    ort = (cv2.resize(rng.standard_normal((12, 16)).astype(np.float32),
                      (w, h), interpolation=cv2.INTER_CUBIC) * 40 + 128
           ).clip(1, 255)
    if holes:
        dem[50:53, 60:63] = nodata           # small fillable hole
        dem[100:180, 200:300] = nodata        # large hole, stays nodata
    write_geotiff(os.path.join(tmp_path, "run-DEM.tif"), dem, GT, "P", nodata)
    write_geotiff(os.path.join(tmp_path, "run-DRG.tif"), ort, GT, "P", nodata)
    return dem, ort


def _lr_dem(dem, w, h):
    import cv2

    d = cv2.resize(dem, (0, 0), fx=0.25, fy=0.25,
                   interpolation=cv2.INTER_AREA)
    d = cv2.resize(d, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_AREA)
    return cv2.resize(d, (w, h), interpolation=cv2.INTER_CUBIC)


class TestIdentityEngine:
    def test_full_map_identity(self, tmp_path, rng):
        td = str(tmp_path)
        dem, _ = _synthetic_pair(td, rng)
        cfg = DSRConfig(image_size=64, stride=8, batch_size=32, tile_size=128,
                        source_folder_path=td, map_name="toy",
                        save_path=os.path.join(td, "out"))
        eng = DEMSuperResolution(cfg, model=None)
        stats = eng.process_map(progress=False)
        assert stats["tiles"] == (300 // 128 + 1) * (420 // 128 + 1)

        mean, std, good = (eng.result[k] for k in ("mean", "std", "good"))
        cov = good > 0
        assert cov.mean() > 0.5
        lr = _lr_dem(dem, 420, 300)
        err = np.abs(mean[cov] - lr[cov])
        # identity model must reproduce the (preprocessed) input DEM up to
        # per-patch fp32 min-max quantization
        assert err.max() < 0.01, err.max()
        assert std[cov].max() < 0.01
        # uncovered pixels carry nodata
        assert (mean[~cov] == cfg.no_value).all()

        out = read_geotiff(os.path.join(td, "out", "toy_mean.tiff"))
        assert out.geo_transform == GT
        assert out.projection == "P"
        np.testing.assert_array_equal(out.data.squeeze(), mean)

    def test_nodata_hole_handling(self, tmp_path, rng):
        td = str(tmp_path)
        dem, _ = _synthetic_pair(td, rng, holes=True)
        cfg = DSRConfig(image_size=64, stride=8, batch_size=32, tile_size=128,
                        source_folder_path=td, map_name="toy",
                        save_path=None)
        eng = DEMSuperResolution(cfg, model=None)
        eng.process_map(progress=False)
        good = eng.result["good"]
        # the large hole rejects every patch touching it -> uncovered center
        assert good[140, 250] == 0
        # holes poison their neighbourhood (NaN spread through the /16
        # LR-DEM synthesis, reference semantics) but most of the raster is
        # still reconstructed
        assert good.mean() > 0.2

    def test_small_hole_interpolated(self, rng):
        """Unit-level check of the fill path: a small blob is interpolated,
        a big blob survives (process_full_tiles.py:364-392 semantics)."""
        from moonsuperresolution_tpu.infer.fill import interpolate_missing_values

        data = rng.standard_normal((64, 64)).astype(np.float32) + 10
        data[10:13, 20:23] = -32768.0       # 9 px, fillable
        data[40:60, 30:60] = -32768.0       # 600 px, too large
        out = interpolate_missing_values(data.copy(), -32768.0,
                                         max_fill_area=256)
        assert (out[10:13, 20:23] > -1000).all()
        assert (out[45:55, 35:55] == -32768.0).all()

    def test_tile_list_sharding(self, tmp_path, rng):
        td = str(tmp_path)
        _synthetic_pair(td, rng)
        cfg = DSRConfig(image_size=64, stride=8, batch_size=32, tile_size=128,
                        source_folder_path=td, map_name="t", save_path=None)
        eng = DEMSuperResolution(cfg, model=None)
        eng.load_images()
        all_tiles = eng.generate_tile_list()
        sharded = [eng.generate_tile_list(i, 3) for i in range(3)]
        assert sorted(sum(sharded, [])) == sorted(all_tiles)

    def test_stride_must_divide(self):
        cfg = DSRConfig(image_size=100, stride=13)
        with pytest.raises(ValueError):
            DEMSuperResolution(cfg, model=None)

    def test_sharded_run_merges_bit_exact(self, tmp_path, rng):
        """3 shards writing per-tile dumps + manifests, merged with
        merge_shards, must equal the single-process maps bit-exactly
        (reference: distributable tile list process_full_tiles.py:313-325 +
        rebuildMap :533-566)."""
        from moonsuperresolution_tpu.infer.merge import merge_shards

        td = str(tmp_path)
        _synthetic_pair(td, rng)

        def mk(save_path):
            return DSRConfig(image_size=64, stride=8, batch_size=32,
                             tile_size=128, source_folder_path=td,
                             map_name="toy", save_path=save_path)

        single = DEMSuperResolution(mk(None), model=None)
        single.process_map(progress=False)

        out_dir = os.path.join(td, "sharded")
        for i in range(3):
            eng = DEMSuperResolution(mk(out_dir), model=None)
            eng.process_map(progress=False, shard_index=i, num_shards=3)
            # shards must not write the full-map triple
            assert not os.path.exists(
                os.path.join(out_dir, "toy_mean.tiff"))

        # incomplete shard set is an error
        os.rename(os.path.join(out_dir, "toy_shard2of3.json"),
                  os.path.join(out_dir, "gone.bak"))
        with pytest.raises(ValueError, match="missing shards"):
            merge_shards(out_dir, "toy")
        os.rename(os.path.join(out_dir, "gone.bak"),
                  os.path.join(out_dir, "toy_shard2of3.json"))

        res = merge_shards(out_dir, "toy", expect_shards=3)
        assert res["tiles"] == len(single.generate_tile_list())

        merged = read_geotiff(res["mean"])
        assert merged.geo_transform == GT
        assert merged.projection == "P"
        np.testing.assert_array_equal(merged.data.squeeze(),
                                      single.result["mean"])
        np.testing.assert_array_equal(
            read_geotiff(res["std"]).data.squeeze(), single.result["std"])
        np.testing.assert_array_equal(
            read_geotiff(res["good"]).data.squeeze(),
            single.result["good"].astype(np.uint16))


class TestStreamingEngine:
    """Streaming row-band pipeline vs the in-RAM engine: same tiles, same
    PRNG keys, windowed fill bit-exact; the only numeric difference is the
    banded cubic /16 upsample (explicit taps vs cv2)."""

    def _run_both(self, tmp_path, rng, holes, h=296, w=420):
        td = str(tmp_path)
        # raster dims divisible by 4 for the streaming area downscale
        dem, _ = _synthetic_pair(td, rng, h=h, w=w, holes=holes)
        out_ram = os.path.join(td, "ram")
        out_st = os.path.join(td, "st")

        def mk(save_path):
            return DSRConfig(image_size=64, stride=8, batch_size=32,
                             tile_size=128, source_folder_path=td,
                             map_name="toy", save_path=save_path)

        ram = DEMSuperResolution(mk(out_ram), model=None)
        ram.process_map(progress=False)
        st = DEMSuperResolution(mk(out_st), model=None)
        stats = st.process_map_streaming(progress=False)
        assert stats["tiles"] == len(ram.generate_tile_list())
        maps = {}
        for k in ("mean", "std", "good"):
            a = read_geotiff(os.path.join(out_ram, f"toy_{k}.tiff"))
            b = read_geotiff(os.path.join(out_st, f"toy_{k}.tiff"))
            assert a.geo_transform == b.geo_transform
            assert a.projection == b.projection
            maps[k] = (a.data.squeeze(), b.data.squeeze())
        return maps

    def test_matches_in_ram_clean_raster(self, tmp_path, rng):
        maps = self._run_both(tmp_path, rng, holes=False)
        good_a, good_b = maps["good"]
        np.testing.assert_array_equal(good_a > 0, good_b > 0)
        mean_a, mean_b = maps["mean"]
        cov = good_a > 0
        assert cov.mean() > 0.5
        # identity model output = denormalized LR-DEM channel; the banded
        # cubic differs from cv2 by float accumulation only
        np.testing.assert_allclose(mean_a[cov], mean_b[cov], atol=0.02)
        np.testing.assert_allclose(maps["std"][0][cov], maps["std"][1][cov],
                                   atol=0.02)

    def test_matches_in_ram_partial_tail_raster(self, tmp_path, rng):
        """Production-raster shape class: quarter height 30 (hq % 4 == 2,
        h16 rounds up) -> the /16 synth has a clipped 2-row tail group.
        The original banded cv2 call computed an empty output here and
        crashed the production streaming run (lr_synth._clipped_box_row)."""
        maps = self._run_both(tmp_path, rng, holes=False, h=120, w=420)
        good_a, good_b = maps["good"]
        np.testing.assert_array_equal(good_a > 0, good_b > 0)
        mean_a, mean_b = maps["mean"]
        cov = good_a > 0
        assert cov.mean() > 0.5
        np.testing.assert_allclose(mean_a[cov], mean_b[cov], atol=0.02)

    def test_sharded_streaming_merges_bit_exact(self, tmp_path, rng):
        """2-shard streaming run + stream-merge == single streaming run,
        bit-exact (tiles are computed independently with per-tile keys)."""
        from moonsuperresolution_tpu.infer.merge import merge_shards_streaming

        td = str(tmp_path)
        _synthetic_pair(td, rng, h=296, w=420, holes=True)
        out_single = os.path.join(td, "single")
        out_sh = os.path.join(td, "sh")

        def mk(save_path):
            return DSRConfig(image_size=64, stride=8, batch_size=32,
                             tile_size=128, source_folder_path=td,
                             map_name="toy", save_path=save_path)

        single = DEMSuperResolution(mk(out_single), model=None)
        single.process_map_streaming(progress=False)

        stats = []
        for i in range(2):
            eng = DEMSuperResolution(mk(out_sh), model=None)
            stats.append(eng.process_map_streaming(
                progress=False, shard_index=i, num_shards=2))
        # 296 px / 128-px tile rows = 3 bands -> shard 0 gets 2, shard 1 gets 1
        assert stats[0]["tiles"] + stats[1]["tiles"] == 3 * (420 // 128 + 1)
        out = merge_shards_streaming(out_sh, "toy", expect_shards=2)
        assert out["bands"] == 3

        for k in ("mean", "std", "good"):
            a = read_geotiff(os.path.join(out_single, f"toy_{k}.tiff"))
            b = read_geotiff(os.path.join(out_sh, f"toy_{k}.tiff"))
            assert a.geo_transform == b.geo_transform
            assert a.projection == b.projection
            np.testing.assert_array_equal(a.data, b.data)

    def test_matches_in_ram_with_holes(self, tmp_path, rng):
        maps = self._run_both(tmp_path, rng, holes=True)
        good_a, good_b = maps["good"]
        # NaN spread through the banded resample can differ by a pixel at
        # hole boundaries; coverage must agree almost everywhere
        agree = (good_a > 0) == (good_b > 0)
        assert agree.mean() > 0.995, agree.mean()
        both = (good_a > 0) & (good_b > 0)
        np.testing.assert_allclose(maps["mean"][0][both],
                                   maps["mean"][1][both], atol=0.05)


class TestValidPacking:
    """The engine must reproduce the reference's batch composition: only
    valid patches are packed (densely, grid order) into generator batches and
    the final short batch is zero-padded (process_full_tiles.py:449-474).
    Observable because SPADE couples outputs across the batch."""

    NO_VALUE = -32768.0
    I, S, T = 16, 8, 32
    B = 4

    @staticmethod
    def _coupled_model(params, source, rng):
        # Output depends on the *whole batch* (like SPADE's (0,1,2) moments):
        # lr-dem channel plus the batch-mean of the ortho channel.
        import jax.numpy as jnp

        return source[..., 1] + jnp.mean(source[..., 0])

    def _engine(self, pack_valid):
        cfg = DSRConfig(image_size=self.I, stride=self.S, batch_size=self.B,
                        tile_size=self.T, no_value=self.NO_VALUE,
                        compute_dtype="float32", pack_valid=pack_valid)
        return DEMSuperResolution(cfg, model=self._coupled_model,
                                  model_params={})

    def _slab(self, rng):
        eng = self._engine(True)
        g = eng.geom
        slab_img = (rng.standard_normal((g.slab, g.slab)) * 30 + 128).astype(
            np.float32)
        slab_dem = (rng.standard_normal((g.slab, g.slab)) * 40 + 1500).astype(
            np.float32)
        # nodata block invalidating a contiguous run of grid patches
        slab_dem[4:20, 4:20] = self.NO_VALUE
        return slab_img, slab_dem

    def _oracle(self, slab_img, slab_dem):
        """Reference-style tile computation: per-patch numpy normalization,
        dense valid-packing, chunked batch-coupled forwards, fold."""
        import jax
        import jax.numpy as jnp

        from moonsuperresolution_tpu.ops.blend import (
            extract_patches, fold_weighted_moments, gaussian_blend_kernel)

        eng = self._engine(True)
        g = eng.geom
        pi = np.asarray(extract_patches(jnp.asarray(slab_img),
                                        (g.grid, g.grid), self.S, self.I))
        pd = np.asarray(extract_patches(jnp.asarray(slab_dem),
                                        (g.grid, g.grid), self.S, self.I))
        n = g.grid * g.grid
        pi, pd = pi.reshape(n, self.I, self.I), pd.reshape(n, self.I, self.I)
        valid = (pi.min((1, 2)) > self.NO_VALUE) & (
            pd.min((1, 2)) > self.NO_VALUE)
        norm = np.zeros((n, self.I, self.I, 2), np.float32)
        dmin = pd.min((1, 2)), pd.max((1, 2))
        for k in range(n):
            im, iM = pi[k].min(), pi[k].max()
            dm, dM = pd[k].min(), pd[k].max()
            norm[k, :, :, 0] = (pi[k] - im) / max(iM - im, 1e-12) - 0.5
            norm[k, :, :, 1] = (pd[k] - dm) / max(dM - dm, 1e-12) - 0.5
        # reference packing: valid patches in grid order, zero-pad the tail
        order = [k for k in range(n) if valid[k]]
        n_chunks = -(-n // self.B)
        packed = np.zeros((n_chunks * self.B, self.I, self.I, 2), np.float32)
        packed[: len(order)] = norm[order]
        preds = np.zeros((n_chunks * self.B, self.I, self.I), np.float32)
        active = -(-len(order) // self.B)
        for c in range(active):
            xb = jnp.asarray(packed[c * self.B : (c + 1) * self.B])
            preds[c * self.B : (c + 1) * self.B] = np.asarray(
                self._coupled_model({}, xb, None))
        out = np.zeros((n, self.I, self.I), np.float32)
        out[order] = preds[: len(order)]
        vals = (out + 0.5) * (dmin[1] - dmin[0])[:, None, None] \
            + dmin[0][:, None, None]
        p0 = g.purge
        vals = vals[:, p0 : self.I - p0, p0 : self.I - p0]
        mean, std, _, good = fold_weighted_moments(
            jnp.asarray(vals.reshape(g.grid, g.grid, g.patch, g.patch)),
            jnp.asarray(valid.reshape(g.grid, g.grid).astype(np.float32)),
            jnp.asarray(gaussian_blend_kernel(self.I)), self.S)
        o = g.halo - p0
        sl = slice(o, o + self.T)
        mean, std, good = (np.asarray(a)[sl, sl] for a in (mean, std, good))
        mean = np.where(good > 0, mean, self.NO_VALUE)
        std = np.where(good > 0, std, self.NO_VALUE)
        return mean, std, good

    def test_packed_engine_matches_reference_batching(self, rng):
        slab_img, slab_dem = self._slab(rng)
        eng = self._engine(True)
        eng.img_padded, eng.dem_padded = slab_img, slab_dem
        mean_e, std_e, good_e = (np.asarray(a) for a in eng.process_tile(0, 0))
        mean_o, std_o, good_o = self._oracle(slab_img, slab_dem)
        assert (good_o > 0).any() and not (good_o > 0).all()
        np.testing.assert_array_equal(good_e, good_o)
        np.testing.assert_allclose(mean_e, mean_o, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(std_e, std_o, rtol=1e-4, atol=1e-4)

    def test_unpacked_mode_differs(self, rng):
        """Sensitivity guard: with pack_valid=False the grid-order chunks mix
        invalid patches into the batch moments, so outputs must differ."""
        slab_img, slab_dem = self._slab(rng)
        packed = self._engine(True)
        packed.img_padded, packed.dem_padded = slab_img, slab_dem
        unpacked = self._engine(False)
        unpacked.img_padded, unpacked.dem_padded = slab_img, slab_dem
        m_p = np.asarray(packed.process_tile(0, 0)[0])
        m_u = np.asarray(unpacked.process_tile(0, 0)[0])
        assert not np.allclose(m_p, m_u)


def test_checkpointed_model_through_engine(tmp_path, rng):
    """Close the production loop: trained params -> Orbax checkpoint ->
    load_model_fn -> full-map inference with the real model."""
    import jax

    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.infer.engine import load_model_fn
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer
    from moonsuperresolution_tpu.utils.checkpoint import save_params

    td = str(tmp_path)
    _synthetic_pair(td, rng, h=140, w=250)

    cfg = TrainConfig(
        model=ModelConfig(variant="cnn_spade", image_size=64, latent_dim=16),
        batch_size=1,
    )
    trainer = GauGANTrainer(cfg)
    params = jax.device_get(trainer.init(jax.random.PRNGKey(0)).params)
    ckpt = str(tmp_path / "ckpt")
    save_params(ckpt, params)

    model, loaded = load_model_fn(ckpt, "cnn_spade", 64, latent_dim=16,
                                  compute_dtype="float32")
    assert model is not None

    eng_cfg = DSRConfig(image_size=64, stride=16, batch_size=32,
                        tile_size=128, source_folder_path=td, map_name="m",
                        save_path=os.path.join(td, "out"),
                        compute_dtype="float32")
    eng = DEMSuperResolution(eng_cfg, model=model, model_params=loaded)
    stats = eng.process_map(progress=False)
    assert stats["patches"] > 0
    good = eng.result["good"]
    mean = eng.result["mean"]
    assert good.mean() > 0.5
    assert np.isfinite(mean[good > 0]).all()
    # real model output differs from the identity (it's an untrained net)
    assert os.path.exists(os.path.join(td, "out", "m_mean.tiff"))
