"""Multi-host data parallelism: scene sharding + per-host batch assembly.

The reference is strictly single-host (SURVEY.md §2.5); its closest analog
is the shared-memory multi-worker loader inside one process
(KPConv-PyTorch/datasets/ScanNet_sphere.py:296-338). The TPU-native design
generalizes that to N hosts as pure config:

  * every process owns a round-robin slice of the scene list
    (:func:`shard_scenes`) — potentials, RGB-D overlap matrices and sphere
    sampling stay process-local, so no cross-host coordination is needed
    (the reference's potentials are approximate under worker races anyway;
    per-host potentials are the same regime);
  * every process samples ``global_batch // process_count`` spheres
    (:func:`local_batch_size`) and assembles its slice of the global batch
    with ``jax.make_array_from_process_local_data``
    (:func:`global_batch_from_local`) — the resulting ``jax.Array`` is
    sharded over the mesh's ``data`` axis exactly like the single-host
    ``shard_batch`` path, so the jitted train step is unchanged;
  * ``make_mesh`` already spans ``jax.devices()`` (all processes), so
    growing from 1 host to N is: same code, bigger mesh.

Single-process is the degenerate case (process_count=1): shard_scenes is
the identity and global_batch_from_local equals shard_batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_scenes(
    scenes: Sequence,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Round-robin slice of ``scenes`` owned by this process.

    Round-robin (rather than contiguous blocks) keeps shard sizes within 1
    of each other for any scene count. Raises if a process would own no
    scenes — fewer scenes than hosts is a config error, not a silent idle
    host.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for {pc} processes")
    shard = list(scenes[pi::pc])
    if not shard:
        raise ValueError(
            f"process {pi}/{pc} owns no scenes ({len(scenes)} total) — "
            "need at least one scene per host"
        )
    return shard


def local_batch_size(
    global_batch: int, process_count: Optional[int] = None
) -> int:
    """Per-host sphere count; the global batch must divide evenly."""
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pc} processes"
        )
    return global_batch // pc


def global_batch_from_local(
    local_batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"
) -> Dict:
    """Assemble the globally-sharded batch from this process's local slice.

    Every leaf's leading dim is the LOCAL batch; the returned jax.Arrays
    have global shape ``local * process_count`` along it, sharded over
    ``axis``. All processes must call this collectively (standard SPMD
    contract of ``jax.make_array_from_process_local_data``).
    """
    sharding = NamedSharding(mesh, P(axis))

    def leaf(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(leaf, local_batch)
