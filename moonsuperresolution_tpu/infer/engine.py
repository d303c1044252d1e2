"""Large-raster DEM super-resolution engine.

TPU-native redesign of the reference's host-loop inference
(process_full_tiles.py:129-594).  The raster is cut into 1024-px tiles with
an (image_size - stride) halo; for each tile, *everything between raster
slicing and the blended mean/std/coverage planes runs on-device in a single
jitted program*:

    patch-grid extraction -> per-patch validity + min-max normalization ->
    chunked generator forwards -> per-patch denormalization -> purge crop ->
    Gaussian-weighted two-pass moment fold (ops/blend.py)

versus the reference, which runs per-patch numpy normalization, one
host->device->host round trip per batch, and a sequential Welford loop per
tile (process_full_tiles.py:363-414).  The overlapping generations double as
a Monte-Carlo uncertainty estimate exactly as in the reference: ~64
generations per pixel at stride = image_size/8, Gaussian-weighted, with
std = sqrt(S / w_sum) (process_full_tiles.py:386-414).

Host work that remains host work: nodata interpolation (scipy, infer/fill.py)
and the one-time /16 low-res DEM synthesis over the full raster.  Tiles
stream through the device with async dispatch so the host slices tile i+1
while the TPU processes tile i.

The tile list is the distribution point (process_full_tiles.py:313-325):
``shard_index / num_shards`` splits it across processes or pods, and within a
process the patch batch axis is shardable over a device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moonsuperresolution_tpu.config import DSRConfig
from moonsuperresolution_tpu.geo.tiff import TiffReader, write_geotiff
from moonsuperresolution_tpu.infer.fill import fill_nodata
from moonsuperresolution_tpu.ops.blend import (
    extract_patches,
    fold_weighted_moments,
    gaussian_blend_kernel,
)


def load_model_fn(
    model_path: Optional[str],
    kind: str,
    image_size: int,
    latent_dim: int = 256,
    compute_dtype: str = "bfloat16",
    quantize: str = "none",
    int8_acc: str = "bfloat16",
):
    """Build the patch-batch model callable.

    ``model_path`` empty/None -> (None, None): identity model — returns the
    low-res DEM channel unchanged, the reference's pipeline-fidelity dry-run
    mode (process_full_tiles.py:139-143).  Otherwise restores an Orbax
    checkpoint of the given variant (utils/checkpoint.py) and returns
    ``(fn, params)`` with ``fn(params, source[B,H,W,2], rng) -> [B,H,W]``.
    Params are threaded as arguments (never closure constants) so the jitted
    tile program stays small and the weights live in HBM once.
    """
    if not model_path:
        return None, None
    from moonsuperresolution_tpu.config import ModelConfig, TrainConfig
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer
    from moonsuperresolution_tpu.utils.checkpoint import restore_params

    cfg = TrainConfig(
        model=ModelConfig(variant=kind, image_size=image_size,
                          latent_dim=latent_dim, compute_dtype=compute_dtype),
        batch_size=1,
    )
    trainer = GauGANTrainer(cfg)
    params = restore_params(model_path)

    if quantize in ("int8", "int8_static"):
        # Opt-in int8 speed mode: the generator convs run s8xs8->s32 on the
        # MXU at 2x the bf16 rate; encoder + SPADE stats stay bf16/f32
        # (models/quant.py).  Outputs deviate slightly from the bf16 path —
        # see tests/test_quant.py for the measured bound.  "int8_static"
        # additionally calibrates per-conv activation scales on synthetic
        # normalized patches, removing the per-tensor max reductions from
        # the compiled program.
        import numpy as _np

        from moonsuperresolution_tpu.models.quant import (
            QuantizedSpadeGenerator,
        )

        # int8_acc="bfloat16" materializes conv results as bf16 (the MXU
        # accumulator stays wide): halves the conv-output write + dequant
        # read HBM traffic, which bounds the int8 path.  "int32" is the
        # exact mode (deviation bounds: tests/test_quant.py).
        qgen = QuantizedSpadeGenerator(image_size=image_size,
                                       acc_dtype=int8_acc)
        qg = qgen.quantize(params["generator"])

        def _calibrate(qparams, src_batch, seed: int, margin: float = 1.05):
            import jax as _jax

            mean, logvar = trainer.encoder.apply(
                {"params": params["encoder"]}, jnp.asarray(src_batch))
            z = trainer._latent(_jax.random.PRNGKey(seed), mean, logvar)
            return qgen.calibrate(qparams, z, jnp.asarray(src_batch),
                                  margin=margin)

        if quantize == "int8_static":
            # Bootstrap scales on synthetic normalized patches; the engine
            # re-calibrates on REAL patches from the target raster before
            # processing (calibrate_on below) — real DEM/ortho activations
            # are structured and can exceed the synthetic ranges, which
            # would silently clip to +-127.
            rng_c = _np.random.default_rng(0)
            for it in range(2):
                src = rng_c.uniform(
                    -0.5, 0.5, (8, image_size, image_size, 2)
                ).astype(_np.float32)
                qg = _calibrate(qg, src, seed=it)
        params = dict(params, generator=qg)

        def fn(params, source, rng):
            mean, logvar = trainer.encoder.apply(
                {"params": params["encoder"]}, source)
            z = trainer._latent(rng, mean, logvar)
            fake = qgen.apply(params["generator"], z, source)
            return fake[..., 0]

        if quantize == "int8_static":
            # Engine hook: widen the static activation scales with real
            # patches from the raster being processed (margin 1.1).
            def calibrate_on(model_params, src_batch):
                qg2 = _calibrate(model_params["generator"], src_batch,
                                 seed=17, margin=1.1)
                return dict(model_params, generator=qg2)

            fn.calibrate_on = calibrate_on

        return fn, params
    elif quantize != "none":
        raise ValueError(f"unknown quantize mode {quantize!r}")

    def fn(params, source, rng):
        fake, _, _ = trainer._generate(params, source, rng)
        return fake[..., 0]

    return fn, params


@dataclasses.dataclass
class TileGeometry:
    image_size: int
    stride: int
    tile_size: int

    def __post_init__(self):
        i, s, t = self.image_size, self.stride, self.tile_size
        if i % s or t % s:
            raise ValueError(
                f"stride {s} must divide image_size {i} and tile_size {t}"
            )
        self.grid = t // s + i // s - 1          # patches per tile side
        self.halo = i - s                         # padding around each tile
        self.slab = t + 2 * self.halo             # on-device slab side
        self.purge = i // 16                      # border purge per patch
        self.patch = i - 2 * self.purge           # folded patch side


class DEMSuperResolution:
    """End-to-end large-raster SR with uncertainty (mean/std/coverage
    GeoTIFF triple), reference-compatible CLI semantics."""

    def __init__(self, config: DSRConfig, model=None, model_params=None,
                 mesh=None):
        self.cfg = config
        # model: fn(params, source[B,I,I,2], rng) -> [B,I,I]; None = identity.
        # Params are a separate pytree argument so the compiled tile program
        # contains no weight constants.
        self.model = model
        self.model_params = model_params
        self.mesh = mesh
        self.geom = TileGeometry(
            config.image_size, config.stride, config.tile_size
        )
        self.no_value = float(config.no_value)
        self._tile_fn = None
        self._tiles_fn = None

    # ------------------------------------------------------------- raster IO

    def load_images(self) -> None:
        """Read the DEM + ortho rasters and their geo metadata
        (reference: process_full_tiles.py:158-182)."""
        img_path = os.path.join(self.cfg.source_folder_path,
                                self.cfg.ortho_image_name)
        dem_path = os.path.join(self.cfg.source_folder_path, self.cfg.dem_name)
        for p in (img_path, dem_path):
            if not os.path.exists(p):
                raise ValueError(f"input raster not found: {p}")
        with TiffReader(img_path) as r:
            self.img = r.read().astype(np.float32).squeeze()
        with TiffReader(dem_path) as r:
            self.dem = r.read().astype(np.float32).squeeze()
            self.geo_transform = r.geo_transform
            self.projection = r.projection
        self.dem_shape = self.dem.shape

    def preprocess(self, fill_method: str = "fast") -> None:
        """Fill small nodata holes and synthesize the /16 low-res
        conditioning DEM (reference: process_full_tiles.py:226-244).

        fill_nodata parallelizes over holed tiles (process pool); the cv2
        resizes are single multi-threaded C++ passes.  Timed separately in
        process_map stats as ``preprocess_s``.
        """
        import cv2

        workers = self.cfg.fill_workers
        self.img = fill_nodata(self.img, self.no_value, tile_size=1024,
                               border=128, max_fill_area=8,
                               method=fill_method, workers=workers)
        dem_rs = self.dem.copy()
        dem_rs[dem_rs <= self.no_value] = np.nan
        dem_rs = cv2.resize(dem_rs, (0, 0), fx=0.25, fy=0.25,
                            interpolation=cv2.INTER_AREA)
        dem_rs[np.isnan(dem_rs)] = self.no_value
        dem_rs = fill_nodata(dem_rs, self.no_value, tile_size=256, border=32,
                             max_fill_area=24, method=fill_method,
                             workers=workers)
        dem_rs[dem_rs <= self.no_value] = np.nan
        dem_rs = cv2.resize(dem_rs, (0, 0), fx=0.25, fy=0.25,
                            interpolation=cv2.INTER_AREA)
        dem_rs = cv2.resize(dem_rs, (self.dem_shape[1], self.dem_shape[0]),
                            interpolation=cv2.INTER_CUBIC)
        dem_rs[np.isnan(dem_rs)] = self.no_value
        self.dem = dem_rs

    def pad_inputs(self) -> None:
        """Pad to tile_size multiples plus the tile halo, filled with
        no_value (reference: process_full_tiles.py:246-267)."""
        g = self.geom
        t = self.cfg.tile_size
        h, w = self.dem_shape
        new_w = ((w // t) + 1) * t + g.halo * 2
        new_h = ((h // t) + 1) * t + g.halo * 2
        self.pad_x = new_w - w - g.halo
        self.pad_y = new_h - h - g.halo
        dem_p = np.full((new_h, new_w), self.no_value, np.float32)
        img_p = np.full((new_h, new_w), self.no_value, np.float32)
        dem_p[g.halo : g.halo + h, g.halo : g.halo + w] = self.dem
        img_p[g.halo : g.halo + h, g.halo : g.halo + w] = self.img
        self.dem_padded, self.img_padded = dem_p, img_p
        self.dem = self.img = None

    def generate_tile_list(self, shard_index: int = 0, num_shards: int = 1):
        """Tile corner list; shardable across processes
        (reference: process_full_tiles.py:313-325)."""
        t = self.cfg.tile_size
        tiles = [
            (xx, yy)
            for yy in range(0, self.dem_shape[0], t)
            for xx in range(0, self.dem_shape[1], t)
        ]
        return tiles[shard_index::num_shards]

    # -------------------------------------------------------- device program

    def _build_tile_fn(self, spmd: bool = True) -> Callable:
        """Jitted single-tile program.  ``spmd=False`` builds the per-device
        body for the shard_map tile-parallel driver (no sharding constraints
        inside)."""
        g = self.geom
        i_sz, s, t = g.image_size, g.stride, g.tile_size
        b = self.cfg.batch_size
        n_patches = g.grid * g.grid
        n_chunks = -(-n_patches // b)
        n_pad = n_chunks * b - n_patches
        weight = jnp.asarray(gaussian_blend_kernel(i_sz))
        no_value = self.no_value
        model = self.model
        compute_dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" \
            else jnp.float32

        # Compiled Pallas is TPU-only; CPU (tests, dev) silently takes the
        # equivalent XLA path (bit-exact, test_pallas pins that).
        use_pallas = (self.cfg.use_pallas_patches and s % 8 == 0
                      and jax.default_backend() == "tpu")
        pack_valid = self.cfg.pack_valid
        scan_unroll = self.cfg.scan_unroll
        mesh = self.mesh if spmd else None

        def tile_program(model_params, img_slab, dem_slab, rng):
            if use_pallas:
                # Fused extraction + validity + min-max normalization in one
                # HBM pass (ops/pallas/patches.py).
                from moonsuperresolution_tpu.ops.pallas.patches import (
                    extract_normalize_patches,
                )

                x, validf, dminv, dmaxv = extract_normalize_patches(
                    img_slab, dem_slab, (g.grid, g.grid), s, i_sz, no_value
                )
                valid = validf > 0
                dmin = dminv[:, None, None]
                dmax = dmaxv[:, None, None]
            else:
                # [G, G, I, I] patch grids via reshape-free dynamic slicing.
                pi = extract_patches(img_slab, (g.grid, g.grid), s, i_sz)
                pd = extract_patches(dem_slab, (g.grid, g.grid), s, i_sz)
                pi = pi.reshape(n_patches, i_sz, i_sz)
                pd = pd.reshape(n_patches, i_sz, i_sz)

                # Validity: any nodata pixel rejects the patch
                # (process_full_tiles.py:269-293).
                valid = (jnp.min(pi, axis=(1, 2)) > no_value) & (
                    jnp.min(pd, axis=(1, 2)) > no_value
                )

                # Per-patch min-max normalization, zero-centered
                # (process_full_tiles.py:295-311).
                imin = jnp.min(pi, axis=(1, 2), keepdims=True)
                imax = jnp.max(pi, axis=(1, 2), keepdims=True)
                pi_n = (pi - imin) / jnp.maximum(imax - imin, 1e-12) - 0.5
                dmin = jnp.min(pd, axis=(1, 2), keepdims=True)
                dmax = jnp.max(pd, axis=(1, 2), keepdims=True)
                pd_n = (pd - dmin) / jnp.maximum(dmax - dmin, 1e-12) - 0.5

                x = jnp.stack([pi_n, pd_n], axis=-1)  # [N, I, I, 2]
            if model is None:
                # Identity: emit the low-res DEM channel — full pipeline
                # fidelity check (process_full_tiles.py:139-143).  Elementwise,
                # so no batch packing is needed.
                preds = x[..., 1]
            else:
                # Reference batch composition: only *valid* patches are packed
                # into inference batches, in grid order, and the final short
                # batch is padded with zero patches (process_full_tiles.py:
                # 454-475).  Because SPADE normalizes with batch-coupled
                # moments, batch membership changes valid-patch outputs — so
                # we gather valid patches densely before chunking (a stable
                # argsort keeps grid order), zero the rest, and scatter the
                # generations back afterwards.  Bonus: chunks past the last
                # valid patch skip the generator entirely, so partially-empty
                # border tiles do proportionally less work.
                x = jnp.where(valid[:, None, None, None], x, 0.0)
                if pack_valid:
                    order = jnp.argsort(~valid, stable=True)
                    x = jnp.take(x, order, axis=0)
                    n_active = jnp.sum(valid.astype(jnp.int32))
                    active_chunks = -(-n_active // b)  # ceil
                    chunk_has_work = jnp.arange(n_chunks) < active_chunks
                else:
                    vp = valid
                    if n_pad:
                        vp = jnp.concatenate(
                            [valid, jnp.zeros((n_pad,), valid.dtype)])
                    chunk_has_work = vp.reshape(n_chunks, b).any(axis=1)
                if n_pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((n_pad, i_sz, i_sz, 2), x.dtype)], 0
                    )
                x = x.reshape(n_chunks, b, i_sz, i_sz, 2)
                if mesh is not None:
                    # Spatial parallelism: each chunk's patch-batch axis
                    # shards over the mesh's data axis; the generator forward
                    # becomes DP and XLA handles any cross-device reductions
                    # (e.g. SPADE batch moments).
                    from jax.sharding import NamedSharding, PartitionSpec

                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, PartitionSpec(None, "data"))
                    )
                rngs = jax.random.split(rng, n_chunks)

                def chunk(carry, inp):
                    xb, r, has_work = inp
                    # Workless chunks (all padding/invalid) skip the
                    # generator via lax.cond — their outputs carry zero
                    # weight in the fold anyway.
                    yb = jax.lax.cond(
                        has_work,
                        lambda: model(
                            model_params, xb.astype(compute_dtype), r
                        ).astype(jnp.float32),
                        lambda: jnp.zeros((b, i_sz, i_sz), jnp.float32),
                    )
                    return carry, yb

                _, preds = jax.lax.scan(chunk, 0, (x, rngs, chunk_has_work),
                                        unroll=scan_unroll)
                preds = preds.reshape(n_chunks * b, i_sz, i_sz)[:n_patches]
                if pack_valid:
                    # Scatter generations back to grid order.
                    preds = jnp.take(preds, jnp.argsort(order), axis=0)
            preds = preds.reshape(n_patches, i_sz, i_sz)

            # Denormalize: +0.5 de-center then per-patch min-max restore
            # (process_full_tiles.py:340, 388).
            vals = (preds + 0.5) * (dmax - dmin) + dmin

            # Purge patch borders and fold (process_full_tiles.py:386-414).
            p0 = g.purge
            vals = vals[:, p0 : i_sz - p0, p0 : i_sz - p0]
            vals = vals.reshape(g.grid, g.grid, g.patch, g.patch)
            mean, std, w_sum, good = fold_weighted_moments(
                vals, valid.reshape(g.grid, g.grid).astype(jnp.float32),
                weight, s,
            )
            # The fold plane starts at +purge in slab coords; the tile's
            # final region is slab [halo : halo+T].
            o = g.halo - p0
            mean_t = jax.lax.dynamic_slice(mean, (o, o), (t, t))
            std_t = jax.lax.dynamic_slice(std, (o, o), (t, t))
            good_t = jax.lax.dynamic_slice(good, (o, o), (t, t))
            mean_t = jnp.where(good_t > 0, mean_t, no_value)
            std_t = jnp.where(good_t > 0, std_t, no_value)
            return mean_t, std_t, good_t

        if not spmd:
            return tile_program
        return jax.jit(tile_program)

    def _build_tiles_fn(self) -> Callable:
        """Tile-parallel driver: one whole tile per device over the mesh's
        data axis via shard_map — the scaling mode for pods (near-linear in
        devices; the per-device program is the ordinary tile program, so
        tile independence is preserved exactly)."""
        from functools import partial

        import functools as _ft

        try:
            from jax import shard_map as _sm

            shard_map = _ft.partial(_sm, check_vma=False)
        except ImportError:  # older jax spells it differently
            from jax.experimental.shard_map import shard_map as _sm

            shard_map = _ft.partial(_sm, check_rep=False)
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        body = self._build_tile_fn(spmd=False)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data")),
        )
        def tiles_program(model_params, img_slabs, dem_slabs, rngs):
            m, s_, gd = body(model_params, img_slabs[0], dem_slabs[0], rngs[0])
            return m[None], s_[None], gd[None]

        return jax.jit(tiles_program)

    def process_tile_group(self, tiles: list[tuple[int, int]]):
        """Process up to mesh-data-size tiles concurrently, one per device.
        Returns a list of (mean, std, good) device arrays, one per tile."""
        if self._tiles_fn is None:
            self._tiles_fn = self._build_tiles_fn()
            if self.model_params is not None:
                self._device_params = jax.device_put(self.model_params)
            else:
                self._device_params = ()
        g = self.geom
        d = self.mesh.shape["data"]
        assert len(tiles) <= d
        if tiles:
            px0, py0 = tiles[0]
            self._maybe_calibrate(
                self.img_padded[py0 : py0 + g.slab, px0 : px0 + g.slab],
                self.dem_padded[py0 : py0 + g.slab, px0 : px0 + g.slab],
            )
        img = np.full((d, g.slab, g.slab), self.no_value, np.float32)
        dem = np.full((d, g.slab, g.slab), self.no_value, np.float32)
        rngs = np.zeros((d, 2), np.uint32)
        for i, (px, py) in enumerate(tiles):
            img[i] = self.img_padded[py : py + g.slab, px : px + g.slab]
            dem[i] = self.dem_padded[py : py + g.slab, px : px + g.slab]
            rngs[i] = np.asarray(self._tile_key(px, py))
        from moonsuperresolution_tpu.parallel.mesh import shard_batch

        img, dem, rngs = shard_batch((img, dem, jnp.asarray(rngs)), self.mesh)
        mean, std, good = self._tiles_fn(self._device_params, img, dem, rngs)
        return [(mean[i], std[i], good[i]) for i in range(len(tiles))]

    # ---------------------------------------------------------- tile driver

    def process_tile(self, px: int, py: int):
        """Process one tile fully on-device; returns (mean, std, good) numpy
        arrays of shape [tile_size, tile_size]."""
        if self._tile_fn is None:
            self._tile_fn = self._build_tile_fn()
            if self.model_params is not None:
                self._device_params = jax.device_put(self.model_params)
            else:
                self._device_params = ()
        g = self.geom
        img_slab = jnp.asarray(self.img_padded[py : py + g.slab, px : px + g.slab])
        dem_slab = jnp.asarray(self.dem_padded[py : py + g.slab, px : px + g.slab])
        rng = self._tile_key(px, py)
        return self._tile_fn(self._device_params, img_slab, dem_slab, rng)

    def _tile_key(self, px: int, py: int):
        """Deterministic per-tile PRNG key from (config seed, tile corner)."""
        base = jax.random.PRNGKey(self.cfg.seed)
        return jax.random.fold_in(jax.random.fold_in(base, px), py)

    def _maybe_calibrate(self, img_slab, dem_slab) -> None:
        """One-time int8_static re-calibration on REAL patches (ADVICE r2):
        the loader bootstraps activation scales on synthetic noise, but real
        DEM/ortho activations are structured and can exceed them (silent
        clipping).  Extract up to 8 valid patches from the first staged
        slab, normalize exactly like the tile program, and widen the scales
        (monotone max) before any tile is processed."""
        if (self.model is None
                or not hasattr(self.model, "calibrate_on")
                or getattr(self, "_calibrated", False)):
            return
        self._calibrated = True
        g = self.geom
        img = np.asarray(img_slab)
        dem = np.asarray(dem_slab)
        patches = []
        for gy in range(g.grid):
            for gx in range(g.grid):
                y, x = gy * g.stride, gx * g.stride
                pi = img[y : y + g.image_size, x : x + g.image_size]
                pd = dem[y : y + g.image_size, x : x + g.image_size]
                if pi.min() <= self.no_value or pd.min() <= self.no_value:
                    continue

                def norm(p):
                    lo, hi = float(p.min()), float(p.max())
                    return (p - lo) / max(hi - lo, 1e-12) - 0.5

                patches.append(np.stack([norm(pi), norm(pd)], axis=-1))
                if len(patches) >= 8:
                    break
            if len(patches) >= 8:
                break
        if not patches:
            return  # fully-invalid slab; synthetic bootstrap scales remain
        batch = np.stack(patches).astype(np.float32)
        self.model_params = self.model.calibrate_on(self.model_params, batch)
        self._device_params = jax.device_put(self.model_params)

    def run_tiles_serial(self, tiles, commit, progress: bool = False,
                         profile_dir: Optional[str] = None,
                         slab_provider=None) -> None:
        """Single-device tile loop with threaded slab staging: while the
        device processes tile i, a worker thread slices and uploads tile
        i+1's slabs (device_put through remote-attached runtimes blocks the
        calling thread, so it runs off the main loop).  ``commit(px, py,
        out)`` is called one tile behind the in-flight one.

        ``slab_provider(px, py) -> (img_slab, dem_slab)`` overrides the
        default full-raster slicing — the streaming engine supplies slabs
        from row bands instead of resident padded rasters."""
        import concurrent.futures

        if self._tile_fn is None:
            self._tile_fn = self._build_tile_fn()
            self._device_params = (
                jax.device_put(self.model_params)
                if self.model_params is not None else ()
            )
        g = self.geom

        def stage(px, py):
            if slab_provider is not None:
                img, dem = slab_provider(px, py)
            else:
                img = self.img_padded[py : py + g.slab, px : px + g.slab]
                dem = self.dem_padded[py : py + g.slab, px : px + g.slab]
            # Force the host->device transfer HERE, inside the staging
            # thread: jnp.asarray is lazy on remote-attached runtimes, so
            # without the block the bytes move only when the tile program
            # dispatches — serially, defeating the overlap.
            staged = jax.device_put((np.ascontiguousarray(img),
                                     np.ascontiguousarray(dem)))
            jax.block_until_ready(staged)
            return staged

        pending = None
        commit_fut = None
        with concurrent.futures.ThreadPoolExecutor(1) as up_pool, \
                concurrent.futures.ThreadPoolExecutor(1) as down_pool:
            staged = stage(*tiles[0]) if tiles else None
            if staged is not None:
                self._maybe_calibrate(*staged)
            for idx, (px, py) in enumerate(tiles):
                nxt = (up_pool.submit(stage, *tiles[idx + 1])
                       if idx + 1 < len(tiles) else None)
                rng = self._tile_key(px, py)
                if profile_dir and idx == 1:  # past compilation
                    with jax.profiler.trace(profile_dir):
                        out = self._tile_fn(self._device_params, *staged, rng)
                        jax.block_until_ready(out)
                else:
                    out = self._tile_fn(self._device_params, *staged, rng)
                if pending is not None:
                    # Result download + map write on its own thread; tiles
                    # write disjoint map regions so ordering is irrelevant.
                    if commit_fut is not None:
                        commit_fut.result()
                    commit_fut = down_pool.submit(commit, *pending)
                pending = (px, py, out)
                if progress:
                    print(f"tile {idx + 1}/{len(tiles)} at ({px},{py})",
                          flush=True)
                staged = nxt.result() if nxt is not None else None
            if commit_fut is not None:
                commit_fut.result()
        if pending is not None:
            commit(*pending)

    def save_tile(self, mean, std, good, name: str) -> None:
        """Optional per-tile dumps in the reference's layout
        (process_full_tiles.py:416-429): tile_<x>_<y>/tile_<x>_<y>_{mean,std,
        correct}.tif.  Useful for distributing post-processing."""
        tile_dir = os.path.join(self.cfg.save_path, f"tile_{name}")
        os.makedirs(tile_dir, exist_ok=True)
        write_geotiff(os.path.join(tile_dir, f"tile_{name}_mean.tif"),
                      np.asarray(mean), compress="lzw")
        write_geotiff(os.path.join(tile_dir, f"tile_{name}_std.tif"),
                      np.asarray(std), compress="lzw")
        write_geotiff(os.path.join(tile_dir, f"tile_{name}_correct.tif"),
                      np.asarray(good), compress="lzw")

    def save_gtiff(self, data: np.ndarray, name: str) -> None:
        """Write one output map as LZW GeoTIFF with geo metadata + nodata
        (reference: process_full_tiles.py:481-531)."""
        os.makedirs(self.cfg.save_path, exist_ok=True)
        path = os.path.join(self.cfg.save_path,
                            f"{self.cfg.map_name}_{name}.tiff")
        write_geotiff(
            path, data, self.geo_transform, self.projection,
            nodata=self.no_value, compress="lzw",
        )

    def process_map(self, progress: bool = True,
                    shard_index: int = 0, num_shards: int = 1,
                    profile_dir: Optional[str] = None,
                    fill_method: str = "fast") -> dict:
        """Full pipeline: load -> preprocess -> pad -> tiles -> 3 GeoTIFFs
        (reference: process_full_tiles.py:568-587).  Returns timing stats."""
        t0 = time.time()
        self.load_images()
        self.preprocess(fill_method=fill_method)
        self.pad_inputs()
        t_pre = time.time() - t0

        h, w = self.dem_shape
        t = self.cfg.tile_size
        mean_map = np.full((h, w), self.no_value, np.float32)
        std_map = np.full((h, w), self.no_value, np.float32)
        good_map = np.zeros((h, w), np.uint8)

        tiles = self.generate_tile_list(shard_index, num_shards)
        # Multi-shard runs write per-tile dumps + a manifest instead of the
        # full maps: concurrent shards on shared storage must not clobber one
        # output path; cli/merge_maps reassembles (reference: rebuildMap,
        # process_full_tiles.py:533-566).
        sharded = num_shards > 1
        # Sharded runs always dump per-tile files (a local decision — the
        # config is not mutated, so a later non-sharded process_map on the
        # same engine keeps its own save_tiles setting).
        save_tiles = self.cfg.save_tiles or sharded
        t1 = time.time()
        tile_parallel = (
            self.mesh is not None and self.mesh.shape.get("data", 1) > 1
        )
        if tile_parallel:
            # One whole tile per device (shard_map): groups of data-size.
            d = self.mesh.shape["data"]
            for gi in range(0, len(tiles), d):
                group = tiles[gi : gi + d]
                outs = self.process_tile_group(group)
                for (px, py), out in zip(group, outs):
                    self._commit_tile((px, py, out), mean_map, std_map,
                                      good_map, save_tiles=save_tiles)
                if progress:
                    print(f"tiles {gi + len(group)}/{len(tiles)}", flush=True)
        else:
            def commit(px, py, out):
                self._commit_tile((px, py, out), mean_map, std_map, good_map,
                                  save_tiles=save_tiles)

            self.run_tiles_serial(tiles, commit, progress=progress,
                                  profile_dir=profile_dir)
        t_tiles = time.time() - t1

        t2 = time.time()
        if self.cfg.save_path:
            if sharded:
                from moonsuperresolution_tpu.infer.merge import (
                    write_shard_manifest,
                )

                write_shard_manifest(
                    self.cfg.save_path, self.cfg.map_name, shard_index,
                    num_shards, tiles, self.dem_shape, t, self.no_value,
                    self.geo_transform, self.projection,
                )
            else:
                # the three maps are independent; write them concurrently
                # (strip compression inside write_geotiff is also threaded)
                import concurrent.futures

                with concurrent.futures.ThreadPoolExecutor(3) as pool:
                    futs = [
                        pool.submit(self.save_gtiff, mean_map, "mean"),
                        pool.submit(self.save_gtiff, std_map, "std"),
                        pool.submit(self.save_gtiff,
                                    good_map.astype(np.uint16), "good"),
                    ]
                    for f in futs:
                        f.result()
        t_save = time.time() - t2

        n_patches = len(tiles) * self.geom.grid ** 2
        stats = {
            "tiles": len(tiles),
            "patches": n_patches,
            "preprocess_s": t_pre,
            "tiles_s": t_tiles,
            "save_s": t_save,
            "patches_per_s": n_patches / max(t_tiles, 1e-9),
        }
        self.result = {"mean": mean_map, "std": std_map, "good": good_map}
        return stats

    def process_map_streaming(self, progress: bool = True,
                              fill_method: str = "fast",
                              shard_index: int = 0,
                              num_shards: int = 1) -> dict:
        """Bounded-memory pipeline for rasters too large to hold in host
        RAM: row-band reads, windowed nodata fill, banded /16 LR synthesis,
        and strip-streamed GeoTIFF output (infer/streaming.py).  With
        ``num_shards > 1`` tile-row bands stride across shards; merge with
        ``infer/merge.py::merge_shards_streaming``."""
        from moonsuperresolution_tpu.infer.streaming import (
            process_map_streaming,
        )

        return process_map_streaming(self, progress=progress,
                                     fill_method=fill_method,
                                     shard_index=shard_index,
                                     num_shards=num_shards)

    def _commit_tile(self, pending, mean_map, std_map, good_map,
                     save_tiles: bool | None = None):
        px, py, (mean_t, std_t, good_t) = pending
        if save_tiles is None:
            save_tiles = self.cfg.save_tiles
        t = self.cfg.tile_size
        h, w = self.dem_shape
        hh = min(t, h - py)
        ww = min(t, w - px)
        mean_map[py : py + hh, px : px + ww] = np.asarray(mean_t)[:hh, :ww]
        std_map[py : py + hh, px : px + ww] = np.asarray(std_t)[:hh, :ww]
        good_map[py : py + hh, px : px + ww] = np.asarray(good_t)[:hh, :ww]
        if save_tiles and self.cfg.save_path:
            self.save_tile(mean_t, std_t, good_t, f"{px}_{py}")
