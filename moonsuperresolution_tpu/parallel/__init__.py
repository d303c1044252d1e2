from moonsuperresolution_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_state_for_dp_tp,
    param_sharding_rules,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_state_for_dp_tp",
    "param_sharding_rules",
]
