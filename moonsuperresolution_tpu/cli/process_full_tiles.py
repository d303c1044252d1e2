"""Large-raster super-resolution CLI (reference: process_full_tiles.py CLI).

    python -m moonsuperresolution_tpu.cli.process_full_tiles \
        --source_folder_path maps/ --map_name site1 --save_path out/ \
        --model_path ckpt/epoch_299 --image_size 512 --stride 64 \
        --batch_size 12

Flag set mirrors the reference (process_full_tiles.py:248-307); leave
``--model_path`` unset for the identity-model pipeline check.  Extras:
``--model_kind`` (gaugan | cnn_spade), ``--shard_index/--num_shards`` to
split the tile list across processes (the reference's "distribute the load"
point, process_full_tiles.py:500).
"""

from __future__ import annotations

import argparse


def parse():
    p = argparse.ArgumentParser("DEM super-resolution over large rasters")
    p.add_argument("--source_folder_path", type=str, required=True)
    p.add_argument("--map_name", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--ortho_image_name", type=str, default="run-DRG.tif")
    p.add_argument("--dem_name", type=str, default="run-DEM.tif")
    p.add_argument("--model_path", type=str, default=None,
                   help="omit for identity processing")
    p.add_argument("--model_kind", type=str, default="gaugan",
                   choices=["gaugan", "cnn_spade"])
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--stride", type=int, default=32,
                   help="window displacement; image_size/8 recommended")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--tile_size", type=int, default=1024)
    p.add_argument("--no_value", type=float, default=-32768.0)
    p.add_argument("--upsample_factor", type=float, default=1.0)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int8_static"],
                   help="int8: dynamically-quantized generator (faster, "
                        "small output deviation); int8_static additionally "
                        "calibrates per-conv activation scales (fastest)")
    p.add_argument("--fill_method", type=str, default="fast",
                   choices=["fast", "reference"],
                   help="nodata interpolation: 'reference' is the exact "
                        "whole-tile cubic griddata (slow); 'fast' restricts "
                        "to hole neighbourhoods")
    p.add_argument("--fill_workers", type=int, default=0,
                   help="process pool for hole filling (0 = one per CPU)")
    p.add_argument("--streaming", action="store_true",
                   help="bounded-memory row-band pipeline for rasters too "
                        "large for host RAM (dims must divide by 4)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize the JAX multi-host runtime and shard the "
                        "tile list by process automatically (merge with "
                        "cli/merge_maps afterwards)")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    from moonsuperresolution_tpu.config import DSRConfig
    from moonsuperresolution_tpu.infer.engine import (
        DEMSuperResolution,
        load_model_fn,
    )

    a = parse()
    if a.distributed or a.coordinator:
        import jax

        from moonsuperresolution_tpu.parallel.distributed import initialize

        initialize(coordinator_address=a.coordinator,
                   num_processes=a.num_processes, process_id=a.process_id)
        if a.num_shards == 1:
            # default: one tile-list shard per process
            a.shard_index = jax.process_index()
            a.num_shards = jax.process_count()
    cfg = DSRConfig(
        image_size=a.image_size, stride=a.stride, batch_size=a.batch_size,
        tile_size=a.tile_size, no_value=a.no_value,
        upsample_factor=a.upsample_factor, map_name=a.map_name,
        save_path=a.save_path, source_folder_path=a.source_folder_path,
        ortho_image_name=a.ortho_image_name, dem_name=a.dem_name,
        model_path=a.model_path, model_kind=a.model_kind,
        compute_dtype=a.compute_dtype, quantize=a.quantize,
        fill_workers=a.fill_workers,
    )
    model, params = load_model_fn(a.model_path, a.model_kind, a.image_size,
                                  quantize=a.quantize)
    engine = DEMSuperResolution(cfg, model=model, model_params=params)
    if a.streaming:
        stats = engine.process_map_streaming(fill_method=a.fill_method,
                                             shard_index=a.shard_index,
                                             num_shards=a.num_shards)
    else:
        stats = engine.process_map(shard_index=a.shard_index,
                                   num_shards=a.num_shards,
                                   fill_method=a.fill_method)
    print(stats)


if __name__ == "__main__":
    main()
