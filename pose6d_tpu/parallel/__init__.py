from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
    shard_state,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_spec",
    "replicated",
    "shard_batch",
    "shard_params",
    "shard_state",
]
