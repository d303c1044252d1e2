"""Device-mesh and sharding utilities.

The reference has no distributed code at all (SURVEY.md §2.2) — scale-out is
SLURM job granularity.  Here parallelism is first-class and expressed the
TPU-native way: a ``jax.sharding.Mesh`` with ('data', 'model') axes and
NamedShardings on the state/batch; XLA's SPMD partitioner inserts all
collectives (gradient all-reduce falls out of the batch-sharded loss mean,
tensor-parallel matmul reductions out of the kernel shardings).

- data axis  : batch dimension of every step (DP).
- model axis : output channels of large kernels (TP) — the SPADE generator's
  latent Dense (256 -> 1024*sw^2) and the 1024-channel resblock convs are the
  only weights big enough to benefit.

Spatial ("sequence-parallel analog") sharding of the inference patch grid
lives in infer/engine.py: the patch-batch axis is sharded over 'data'.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple | None = None,
              axis_names: tuple = ("data", "model"),
              devices=None) -> Mesh:
    """Build a mesh.  ``shape=None`` puts all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch / patch-batch) over the data axis."""
    spec = [None] * 1
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(mesh: Mesh, min_dim: int = 512):
    """Return ``rule(path, x) -> NamedSharding`` implementing Megatron-style
    tensor parallelism on the SPADE generator — the only network whose
    kernels are big enough to benefit (1024-channel resblock convs + the
    latent Dense).

    The pairing keeps the compiled program free of all-to-alls (verified
    against the step HLO; the round-2 gate failure was GSPMD resharding
    kernels between conflicting per-conv strategies):

    - ``resblock_*/conv_1`` and ``conv_3`` kernels: column-parallel (output
      channels over 'model') — their outputs flow channel-sharded through
      SPADE_2's per-channel statistics with zero communication;
    - ``resblock_*/conv_2`` kernels: row-parallel (input channels over
      'model') — consumes the channel-sharded activations directly; the
      partial sums reduce with ONE all-reduce per block;
    - the latent ``dense``: row-parallel over the latent dim (all-reduce of
      a [B, 1024*sw^2] vector);
    - everything else (SPADE gamma/beta convs, heads, encoder,
      discriminator, VGG) is replicated: the fused gamma/beta conv slices a
      *replicated* kernel locally, so the single-chip concat fusion stays
      collective-free under TP.

    ``min_dim`` gates sharding on the partitioned dim's width (conv_1/3:
    output channels; conv_2: input channels) — because a resblock's conv_1
    output width equals conv_2's input width, pairs shard or replicate
    together and activations never need resharding between them.
    """
    model_size = mesh.shape["model"]

    def rule(path: str, x):
        shape = getattr(x, "shape", ())
        if model_size <= 1 or len(shape) < 2:
            return NamedSharding(mesh, P())
        is_resblock = "resblock_" in path
        if (
            is_resblock
            and ("/conv_1/kernel" in path or "/conv_3/kernel" in path)
            and shape[-1] >= min_dim
            and shape[-1] % model_size == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + ["model"]))
            )
        if (
            is_resblock
            and "/conv_2/kernel" in path
            and shape[-2] >= min_dim
            and shape[-2] % model_size == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 2) + ["model", None]))
            )
        if (
            "generator" in path
            and path.endswith("dense/kernel")
            and shape[0] % model_size == 0
            and shape[-1] >= min_dim
        ):
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return rule


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", None)
        if key is None:
            key = getattr(p, "idx", "")
        parts.append(str(key))
    return "/".join(parts)


def shard_state_for_dp_tp(state, mesh: Mesh, min_dim: int = 512):
    """Device_put a train-state pytree with TP shardings on the generator's
    large kernels and replication elsewhere.  Optimizer moments follow their
    parameters: the Adam mu/nu subtrees repeat the param key paths, which is
    what the path rule matches on."""
    rule = param_sharding_rules(mesh, min_dim)
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, x: rule(_path_str(path), x), state
    )
    return jax.device_put(state, shardings)


def shard_batch(batch, mesh: Mesh):
    """Put a host batch onto the mesh, sharded over the data axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
