"""Device mesh + sharding helpers.

The reference has no distributed training at all (SURVEY.md §2.5: single GPU,
optional nn.DataParallel). The TPU-native scaling story is data parallelism
over a ``jax.sharding.Mesh``: batches (spheres/chunks) are sharded over the
``data`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI. The mesh abstraction keeps a second ``model`` axis
available so layouts generalize past one host, but every model in this
family fits comfortably on one chip — the win is in scaling throughput, not
capacity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh over all (or given) devices; defaults to 1-D data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names[: arr.ndim]))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays with a leading (batch) dim split over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put every leaf of a batch pytree, sharded on its leading dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
