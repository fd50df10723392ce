"""Device-mesh parallelism utilities."""

from mvkpconv_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    model_sharding,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "model_sharding",
    "replicated",
    "shard_batch",
]
