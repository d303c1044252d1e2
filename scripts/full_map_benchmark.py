"""Full-size process_map benchmark: the reference's production workload.

Synthesizes a 15000x70000 raster pair (the reference's maximum map size,
README.md:13 / run_GAN.sh), runs the complete pipeline — load, preprocess
(nodata fill + /16 LR-DEM synthesis), pad, every tile through the real
GauGAN at image 512 / stride 64 (run_GAN.sh:24-26), GeoTIFF export — and
records wall-clock per phase.  This is the measured (not extrapolated)
number for the <5 min v5e-8 target in BASELINE.md; on a single chip the
aggregate target is patches_per_s >= ~1920/8 with preprocess small.

    python scripts/full_map_benchmark.py --out /tmp/fullmap \
        [--height 15000 --width 70000] [--quantize int8|int8_static] [--num_shards 1]

Writes <out>/stats.json.  ~30-60 min on one v5e chip at full size; use
--height/--width to scale down for smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow running as `python scripts/full_map_benchmark.py` from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_raster(out_dir: str, h: int, w: int, seed: int = 0):
    """Smooth synthetic terrain + ortho pair written as GeoTIFFs."""
    import cv2
    import numpy as np

    from moonsuperresolution_tpu.geo.tiff import write_geotiff

    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((h // 100, w // 100)).astype(np.float32)
    dem = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_CUBIC)
    dem = dem * 120.0 + 1500.0
    coarse_o = rng.standard_normal((h // 50, w // 50)).astype(np.float32)
    ort = cv2.resize(coarse_o, (w, h), interpolation=cv2.INTER_CUBIC)
    ort = np.clip(ort * 40.0 + 128.0, 1.0, 255.0)

    gt = (30.5, 2.0, 0.0, -10.25, 0.0, -2.0)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    write_geotiff(os.path.join(out_dir, "run-DEM.tif"), dem, gt, "SYNTH",
                  nodata=-32768.0, compress="none", bigtiff=True)
    write_geotiff(os.path.join(out_dir, "run-DRG.tif"), ort, gt, "SYNTH",
                  nodata=-32768.0, compress="none", bigtiff=True)
    return time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=15000)
    p.add_argument("--width", type=int, default=70000)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--stride", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--quantize", type=str, default="none")
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--skip_synth", action="store_true",
                   help="reuse rasters already in --out/src")
    p.add_argument("--streaming", action="store_true",
                   help="bounded-memory row-band pipeline with overlapped "
                        "host phases (infer/streaming.py)")
    a = p.parse_args()

    src = os.path.join(a.out, "src")
    if not a.skip_synth and not os.path.exists(
            os.path.join(src, "run-DEM.tif")):
        synth_s = synthesize_raster(src, a.height, a.width)
        print(f"synthesized raster in {synth_s:.1f}s", flush=True)

    import jax
    import numpy as np

    from moonsuperresolution_tpu.config import (
        DSRConfig, ModelConfig, TrainConfig)
    from moonsuperresolution_tpu.infer.engine import DEMSuperResolution
    from moonsuperresolution_tpu.train.trainers import GauGANTrainer

    tcfg = TrainConfig(
        model=ModelConfig(variant="gaugan", image_size=a.image_size,
                          latent_dim=256, compute_dtype="bfloat16"),
        batch_size=a.batch_size,
    )
    trainer = GauGANTrainer(tcfg)
    params = trainer.init(jax.random.PRNGKey(0)).params
    params = {"generator": params["generator"], "encoder": params["encoder"]}

    if a.quantize in ("int8", "int8_static"):
        from moonsuperresolution_tpu.models.networks import sample_latent
        from moonsuperresolution_tpu.models.quant import (
            QuantizedSpadeGenerator)

        qgen = QuantizedSpadeGenerator(
            image_size=a.image_size,
            acc_dtype=os.environ.get("BENCH_INT8_ACC", "bfloat16"))
        qg = qgen.quantize(params["generator"])
        if a.quantize == "int8_static":
            import jax.numpy as jnp

            rng_c = np.random.default_rng(0)
            for it in range(2):
                csrc = jnp.asarray(rng_c.uniform(
                    -0.5, 0.5, (8, a.image_size, a.image_size, 2)),
                    jnp.float32)
                mean, logvar = trainer.encoder.apply(
                    {"params": params["encoder"]}, csrc)
                z = sample_latent(jax.random.PRNGKey(it), mean, logvar)
                qg = qgen.calibrate(qg, z, csrc)
        params = dict(params, generator=qg)

        def model_fn(pms, source, rng):
            mean, logvar = trainer.encoder.apply(
                {"params": pms["encoder"]}, source)
            z = sample_latent(rng, mean, logvar)
            return qgen.apply(pms["generator"], z, source)[..., 0]
    else:
        def model_fn(pms, source, rng):
            fake, _, _ = trainer._generate(pms, source, rng)
            return fake[..., 0]

    cfg = DSRConfig(
        image_size=a.image_size, stride=a.stride, batch_size=a.batch_size,
        tile_size=1024, map_name="fullmap", save_path=os.path.join(a.out,
                                                                   "maps"),
        source_folder_path=src, compute_dtype="bfloat16",
        quantize=a.quantize,
    )
    eng = DEMSuperResolution(cfg, model=model_fn, model_params=params)
    t0 = time.time()
    if a.streaming:
        stats = eng.process_map_streaming(progress=True,
                                          shard_index=a.shard_index,
                                          num_shards=a.num_shards)
    else:
        stats = eng.process_map(progress=True, shard_index=a.shard_index,
                                num_shards=a.num_shards)
    stats["total_s"] = time.time() - t0
    # host work not hidden under the tile phase (the <5-min composition
    # cares about this, not the phase sum)
    stats["host_exclusive_s"] = stats["total_s"] - stats["tiles_s"]
    if a.streaming and "device_busy_s" in stats:
        # Hardened v5e-8 projection (VERDICT r4 #5): the device phase
        # divides by 8 chips, but the per-band host prep (ortho fill + LR
        # taps + slab assembly, measured serially on THIS host) only
        # shrinks with host cores.  A v5e-8 host has >= 8 usable cores
        # (production pods ship 100+; this bench host has 1), and the fill
        # + LZW stages are already pool-parallel, so prep_wall_s/8 is the
        # conservative host-side bound.  Note the synthetic rasters are
        # hole-free: the nodata-fill path (the reference's griddata step,
        # process_full_tiles.py:184-212) contributes ~0 to prep here.
        host_cores = 8
        stats["projection_v5e8"] = {
            "formula": "max(device_busy_s/8, prep_wall_s/host_cores)"
                       " + prep_exposed_s + preprocess_s + save_s",
            "assumed_host_cores": host_cores,
            "seconds": (max(stats["device_busy_s"] / 8.0,
                            stats["prep_wall_s"] / host_cores)
                        + stats["prep_exposed_s"]
                        + stats["preprocess_s"] + stats["save_s"]),
            "synthetic_rasters_hole_free": True,
        }
    stats["quantize"] = a.quantize
    stats["image_size"] = a.image_size
    stats["stride"] = a.stride
    stats["raster"] = [a.height, a.width]
    with open(os.path.join(a.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
