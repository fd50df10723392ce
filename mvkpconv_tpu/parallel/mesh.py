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


def model_sharding(mesh: Mesh, params, axis: str = "model", min_dim: int = 64):
    """Tensor-parallel parameter shardings over the ``model`` mesh axis.

    Shards each parameter's trailing (output-channel) dimension over ``axis``
    when it divides evenly and is at least ``min_dim`` wide — the KPConv
    ``(M, Cin, Cout)`` weights, dense kernels and conv kernels all carry
    channels last, and channel-wise 1-D vectors (biases, BN scales) of that
    width shard right along with the matching weight outputs. Everything
    narrower (small biases, kernel offsets) is replicated. With batch
    sharded over ``data`` and params laid out
    this way, XLA inserts the activation all-gathers / grad reduce-scatters
    over ICI on its own; no model in this family *needs* the capacity, so
    this is the scaling layout kept exercised for multi-host growth
    (SURVEY.md §2.5 TPU-native equivalent).
    """
    size = mesh.shape[axis] if axis in mesh.shape else 1

    def rule(x):
        if size > 1 and x.ndim >= 1 and x.shape[-1] >= min_dim and x.shape[-1] % size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
        return replicated(mesh)

    return jax.tree.map(rule, params)
