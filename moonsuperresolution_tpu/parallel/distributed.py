"""Multi-host (multi-process) runtime plumbing.

The reference has no distributed execution at all — SLURM launches
independent single-GPU jobs (run_GAN.sh:2-11).  Here true multi-host runs
use JAX's distributed runtime: every process calls
``jax.distributed.initialize`` against a shared coordinator, after which
``jax.devices()`` is the *global* device list, meshes span all hosts, and
GSPMD collectives ride ICI within a slice / DCN across slices.

Division of labour per process:
- training: each process loads a disjoint slice of the dataset key space
  (``TileSampler(process_index=, process_count=)``) and contributes its
  local batch shard via ``global_batch`` below.
- inference: the tile list is sharded by process
  (``DEMSuperResolution.generate_tile_list(shard_index, num_shards)`` with
  the process index/count) and outputs compose via cli/merge_maps.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, JAX auto-detects the cluster environment (TPU pod
    metadata, SLURM variables).  Explicit arguments take precedence; they can
    also come from MOONSR_COORDINATOR / MOONSR_NUM_PROCESSES /
    MOONSR_PROCESS_ID env vars (useful under plain SLURM array jobs).
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "MOONSR_COORDINATOR")
    if num_processes is None and os.environ.get("MOONSR_NUM_PROCESSES"):
        num_processes = int(os.environ["MOONSR_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MOONSR_PROCESS_ID"):
        process_id = int(os.environ["MOONSR_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_info() -> tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def global_batch(local_batch, mesh) -> object:
    """Assemble a global, data-sharded array from per-process local batches.

    Each process passes its *local* shard (global_batch_size /
    process_count rows); the result is a global jax.Array sharded over the
    mesh's 'data' axis, usable directly by the jitted steps.  Single-process
    meshes degrade to a plain device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)
