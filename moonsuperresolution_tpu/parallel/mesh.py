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
    """Return a function mapping an array to its NamedSharding.

    Tensor-parallel rule: any >=2-D weight whose final (output-channel) dim is
    both >= ``min_dim`` and divisible by the model-axis size is sharded on
    'model' over that dim; everything else is replicated.  Applied uniformly
    to params *and* their Adam moments (same shapes).
    """
    model_size = mesh.shape["model"]

    def rule(x):
        shape = getattr(x, "shape", ())
        if (
            model_size > 1
            and len(shape) >= 2
            and shape[-1] >= min_dim
            and shape[-1] % model_size == 0
        ):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def shard_state_for_dp_tp(state, mesh: Mesh, min_dim: int = 512):
    """Device_put a train-state pytree with TP shardings on large kernels and
    replication elsewhere.  Optimizer moments follow their parameters because
    the rule is shape-based."""
    rule = param_sharding_rules(mesh, min_dim)
    shardings = jax.tree_util.tree_map(rule, state)
    return jax.device_put(state, shardings)


def shard_batch(batch, mesh: Mesh):
    """Put a host batch onto the mesh, sharded over the data axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
