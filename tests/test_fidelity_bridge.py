"""The fidelity bridge, end to end: TF SavedModel checkpoint -> weight
import -> full-map engine inference -> RMSE against a reference-style
computation driven by the LIVE Keras model.

This is the <0.5% DEM RMSE north star (BASELINE.md) exercised with a real
SavedModel directory in the reference's checkpoint layout (generator/ +
encoder/, model.py:569-605).  The "reference side" reproduces the
reference's inference algorithm directly (patch loop, valid-only batching
with zero-padding, per-patch min-max normalization, Gaussian-weighted
incremental Welford blending — process_full_tiles.py:431-479, 347-414) in
plain numpy, calling the Keras model for every batch.  The engine side runs
our TPU-native program on the imported weights.

Uses the no-KL variant (deterministic latent z = mean + logvar) so both
sides are rng-free.  Slow (Keras build + SavedModel export + two full
inference passes); TF-gated.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from moonsuperresolution_tpu.config import DSRConfig  # noqa: E402
from moonsuperresolution_tpu.geo import write_geotiff  # noqa: E402
from moonsuperresolution_tpu.infer import DEMSuperResolution  # noqa: E402

IMG = 64          # patch size (engine image_size)
LATENT = 16
STRIDE = 8
TILE = 128
BATCH = 8
NO_VALUE = -32768.0
GT = (30.5, 2.0, 0.0, -10.25, 0.0, -2.0)


def _build_and_export(tmp_path):
    """Keras encoder+generator in the reference architecture, exported as
    the reference's checkpoint directory layout."""
    try:
        from test_keras_parity import build_keras_encoder, build_keras_generator
    except ImportError:
        from tests.test_keras_parity import (
            build_keras_encoder,
            build_keras_generator,
        )

    k_enc = build_keras_encoder()
    k_gen = build_keras_generator()
    ckpt = str(tmp_path / "epoch_0")
    k_enc.export(os.path.join(ckpt, "encoder"))
    k_gen.export(os.path.join(ckpt, "generator"))
    return k_enc, k_gen, ckpt


def _reference_inference(k_enc, k_gen, img_slab, dem_slab, geom):
    """The reference's per-tile algorithm, verbatim in numpy + live Keras."""
    g = geom
    n = g.grid
    size = g.image_size
    # Gaussian kernel (process_full_tiles.py:347-361)
    from moonsuperresolution_tpu.ops.blend import gaussian_blend_kernel

    purge = g.purge
    # gaussian_blend_kernel already crops the purge border -> (size-2*purge)^2
    w_core = np.asarray(gaussian_blend_kernel(size), np.float64)

    # collect valid patches in grid order (process_full_tiles.py:449-466)
    entries = []   # (gy, gx, norm_patch, dmin, dmax)
    for gy in range(n):
        for gx in range(n):
            y0, x0 = gy * g.stride, gx * g.stride
            pi = img_slab[y0 : y0 + size, x0 : x0 + size]
            pd = dem_slab[y0 : y0 + size, x0 : x0 + size]
            if pi.min() <= NO_VALUE or pd.min() <= NO_VALUE:
                continue
            im, iM = pi.min(), pi.max()
            dm, dM = pd.min(), pd.max()
            src = np.stack([
                (pi - im) / max(iM - im, 1e-12) - 0.5,
                (pd - dm) / max(dM - dm, 1e-12) - 0.5,
            ], -1).astype(np.float32)
            entries.append((gy, gx, src, dm, dM))

    # batched forwards with zero-padded final batch (:467-474)
    outs = {}
    for c0 in range(0, len(entries), BATCH):
        chunk = entries[c0 : c0 + BATCH]
        batch = np.zeros((BATCH, size, size, 2), np.float32)
        for j, (_, _, src, _, _) in enumerate(chunk):
            batch[j] = src
        batch_t = tf.convert_to_tensor(batch)
        mean_t, logvar_t = k_enc(batch_t)
        z = mean_t + logvar_t            # deterministic no-KL latent
        pred = np.asarray(k_gen([z, batch_t]))[..., 0]
        for j, (gy, gx, _, dm, dM) in enumerate(chunk):
            outs[(gy, gx)] = (pred[j] + 0.5) * (dM - dm) + dm

    # Gaussian-weighted incremental Welford (process_full_tiles.py:363-414)
    plane = g.slab
    w_sum = np.zeros((plane, plane), np.float64)
    mean = np.zeros((plane, plane), np.float64)
    m2 = np.zeros((plane, plane), np.float64)
    good = np.zeros((plane, plane), np.uint8)
    for (gy, gx), val in outs.items():
        y0 = gy * g.stride + purge
        x0 = gx * g.stride + purge
        v = val[purge : size - purge, purge : size - purge].astype(np.float64)
        sl = np.s_[y0 : y0 + v.shape[0], x0 : x0 + v.shape[1]]
        w_new = w_sum[sl] + w_core
        delta = v - mean[sl]
        r = delta * w_core / w_new
        mean[sl] = mean[sl] + r
        m2[sl] = m2[sl] + w_sum[sl] * delta * r
        w_sum[sl] = w_new
        good[sl] += 1

    std = np.sqrt(np.divide(m2, w_sum, out=np.zeros_like(m2),
                            where=w_sum > 0))
    covered = w_sum > 0
    mean = np.where(covered, mean, NO_VALUE)
    std = np.where(covered, std, NO_VALUE)
    o = g.halo
    t = TILE
    return (mean[o : o + t, o : o + t].astype(np.float32),
            std[o : o + t, o : o + t].astype(np.float32),
            good[o : o + t, o : o + t])


def test_savedmodel_to_engine_rmse(tmp_path, rng):
    from moonsuperresolution_tpu.utils.checkpoint import import_tf_savedmodel

    k_enc, k_gen, ckpt = _build_and_export(tmp_path)
    params = import_tf_savedmodel(ckpt, with_discriminator=False)

    # synthetic raster: one tile's worth
    import cv2

    h = w = TILE
    dem = cv2.resize(rng.standard_normal((6, 8)).astype(np.float32), (w, h),
                     interpolation=cv2.INTER_CUBIC) * 100 + 1500
    ort = (cv2.resize(rng.standard_normal((12, 16)).astype(np.float32),
                      (w, h), interpolation=cv2.INTER_CUBIC) * 40 + 128
           ).clip(1, 255)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    write_geotiff(os.path.join(src_dir, "run-DEM.tif"), dem, GT, "P", NO_VALUE)
    write_geotiff(os.path.join(src_dir, "run-DRG.tif"), ort, GT, "P", NO_VALUE)

    # --- engine side: imported weights, deterministic no-KL latent
    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    tcfg = TrainConfig(
        model=ModelConfig(variant="gaugan_no_kl", image_size=IMG,
                          latent_dim=LATENT, compute_dtype="float32"),
        batch_size=BATCH,
    )
    trainer = GauGANTrainer(tcfg)

    def model_fn(p, source, rng_):
        fake, _, _ = trainer._generate(p, source, rng_)
        return fake[..., 0]

    cfg = DSRConfig(image_size=IMG, stride=STRIDE, batch_size=BATCH,
                    tile_size=TILE, no_value=NO_VALUE,
                    source_folder_path=src_dir, map_name="bridge",
                    save_path=None, compute_dtype="float32")
    eng = DEMSuperResolution(cfg, model=model_fn, model_params=params)
    eng.process_map(progress=False)
    mean_e = eng.result["mean"]
    good_e = eng.result["good"]

    # --- reference side: live Keras over the same preprocessed slabs
    geom = eng.geom
    img_slab = eng.img_padded[0 : geom.slab, 0 : geom.slab]
    dem_slab = eng.dem_padded[0 : geom.slab, 0 : geom.slab]
    mean_r, std_r, good_r = _reference_inference(
        k_enc, k_gen, img_slab, dem_slab, geom)

    cov = (good_e > 0) & (good_r > 0)
    assert cov.mean() > 0.8
    # engine's good plane is binary coverage; the oracle counts generations
    np.testing.assert_array_equal(good_e > 0, good_r > 0)

    dem_span = dem.max() - dem.min()
    rmse = np.sqrt(np.mean((mean_e[cov] - mean_r[cov]) ** 2))
    rel = rmse / dem_span
    print(f"fidelity bridge: RMSE {rmse:.5f} ({100 * rel:.4f}% of DEM span)")
    # north star: <0.5% DEM RMSE deviation (BASELINE.md)
    assert rel < 0.005, rel
