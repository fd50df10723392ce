"""Device-mesh parallelism utilities."""

from mvkpconv_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    model_sharding,
    replicated,
    shard_batch,
)
from mvkpconv_tpu.parallel.multihost import (
    global_batch_from_local,
    local_batch_size,
    shard_scenes,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "model_sharding",
    "replicated",
    "shard_batch",
    "shard_scenes",
    "local_batch_size",
    "global_batch_from_local",
]
