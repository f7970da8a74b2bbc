from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_spec,
    replicated,
    shard_map_no_check,
    state_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_spec",
    "replicated",
    "shard_map_no_check",
    "state_sharding",
]
