from .mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    replicated_scalar,
    shard_batch,
    local_batch_size,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "replicated_scalar",
    "shard_batch",
    "local_batch_size",
]
