from .mesh import (
    data_sharding,
    local_device_count,
    make_mesh,
    replicated,
    shard_batch,
)
from .shard_eval import make_sharded_separate, pad_batch_to_devices

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "local_device_count",
    "make_sharded_separate",
    "pad_batch_to_devices",
]
