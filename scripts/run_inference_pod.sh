#!/usr/bin/env bash
# Distribute a full-map super-resolution run across hosts by sharding the
# tile list — the TPU-era replacement of the reference's single-GPU SLURM
# wrapper (reference: run_GAN.sh:1-34, which ran image 512 / stride 64 /
# batch 12 on one V100 under a 6 h limit).
#
# Each invocation processes every NUM_SHARDS-th tile; run one per host (or
# per SLURM array task with SHARD_INDEX=$SLURM_ARRAY_TASK_ID).  With
# NUM_SHARDS > 1 each shard writes per-tile dumps plus a manifest (no full
# maps — concurrent shards share the output dir safely); after all shards
# finish, assemble the final mean/std/good triple once:
#
#   python -m moonsuperresolution_tpu.cli.merge_maps \
#       --save_path /out --map_name site1 --num_shards 4
#
# Usage:
#   SHARD_INDEX=0 NUM_SHARDS=4 ./scripts/run_inference_pod.sh \
#       /maps/site1 site1 /out /ckpt/epoch_299
set -euo pipefail

SRC="${1:?source folder with run-DEM.tif + run-DRG.tif}"
NAME="${2:?map name}"
OUT="${3:?output dir}"
MODEL="${4:-}"        # empty -> identity pipeline check

SHARD_INDEX="${SHARD_INDEX:-0}"
NUM_SHARDS="${NUM_SHARDS:-1}"

python -m moonsuperresolution_tpu.cli.process_full_tiles \
  --source_folder_path "$SRC" \
  --map_name "$NAME" \
  --save_path "$OUT" \
  ${MODEL:+--model_path "$MODEL"} \
  --image_size 512 --stride 64 --batch_size 16 --tile_size 1024 \
  --shard_index "$SHARD_INDEX" --num_shards "$NUM_SHARDS"
