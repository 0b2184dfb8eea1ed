from .mesh import (
    data_sharding,
    fsdp_shardings,
    local_device_count,
    make_mesh,
    replicate_global,
    replicated,
    shard_batch,
    shard_params_fsdp,
)
from .shard_eval import make_sharded_separate, pad_batch_to_devices
from .tensor_parallel import make_mesh_2d, make_tp_separate, tp_shardings

__all__ = [
    "make_mesh_2d",
    "make_tp_separate",
    "tp_shardings",
    "make_mesh",
    "fsdp_shardings",
    "shard_params_fsdp",
    "data_sharding",
    "replicate_global",
    "replicated",
    "shard_batch",
    "local_device_count",
    "make_sharded_separate",
    "pad_batch_to_devices",
]
