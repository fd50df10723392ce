"""Point sampling ops: farthest point sampling and voxel-grid subsampling.

TPU-native replacements for:
  * mvpnet/ops/cuda/fps_kernel.cu — iterative FPS (first centroid = index 0,
    argmax ties resolved to the lowest index, matching the numpy oracle in
    mvpnet/ops/tests/test_fps.py:7-37);
  * KPConv-PyTorch/cpp_wrappers/cpp_subsampling/grid_subsampling.cpp —
    voxel-grid barycenter subsampling with feature average and majority-vote
    labels (grid_subsampling.cpp:53-103).

Both are reformulated for static shapes: ``grid_subsample`` emits a fixed
``max_out`` buffer plus a validity mask (voxels are ordered by voxel id;
overflow beyond ``max_out`` is dropped and reported via ``num_valid``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops.common import SHADOW_COORD, masked_points


def _fps_core(points: jnp.ndarray, mask: Optional[jnp.ndarray], num_samples: int):
    n = points.shape[0]
    neg_inf = jnp.float32(-jnp.inf)

    def body(i, state):
        min_d2, cur, out = state
        cur_xyz = points[cur]
        d2 = jnp.sum((points - cur_xyz[None, :]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        cand = min_d2 if mask is None else jnp.where(mask, min_d2, neg_inf)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        out = out.at[i].set(nxt)
        return min_d2, nxt, out

    out = jnp.zeros((num_samples,), jnp.int32)
    init = (jnp.full((n,), jnp.inf, jnp.float32), jnp.int32(0), out)
    _, _, out = jax.lax.fori_loop(1, num_samples, body, init)
    return out


def farthest_point_sample(
    points: jnp.ndarray, num_samples: int, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Args:
      points: (..., N, 3). The first centroid is always index 0 (reference
        fps_kernel.cu:79 convention).
      num_samples: number of centroids.
      mask: optional (..., N) validity mask; invalid points are never picked.

    Returns:
      (..., num_samples) int32 centroid indices.
    """
    core = functools.partial(_fps_core, num_samples=num_samples)
    if points.ndim == 2:
        return core(points, mask)
    if mask is None:
        return jax.vmap(lambda p: core(p, None))(points)
    return jax.vmap(core)(points, mask)


class GridSubsampleResult(NamedTuple):
    points: jnp.ndarray  # (..., max_out, 3), invalid slots at SHADOW_COORD
    mask: jnp.ndarray  # (..., max_out) bool
    features: Optional[jnp.ndarray]  # (..., max_out, C) voxel means
    labels: Optional[jnp.ndarray]  # (..., max_out) majority vote, pad=ignore
    num_valid: jnp.ndarray  # (...,) int32 — voxel count BEFORE max_out cap


def _grid_subsample_core(
    points, mask, features, labels, cell_size, max_out, num_classes, ignore_label
):
    n = points.shape[0]
    inv_cell = jnp.float32(1.0 / cell_size)
    big = jnp.where(mask[:, None], points, jnp.inf)
    origin = jnp.floor(jnp.min(big, axis=0) * inv_cell).astype(jnp.int32)
    vox = jnp.floor(points * inv_cell).astype(jnp.int32) - origin[None, :]
    vox = jnp.clip(vox, 0, 2**10 - 1)  # 3×10 bits → id fits int32
    vid = (vox[:, 0] << 20) | (vox[:, 1] << 10) | vox[:, 2]
    vid = jnp.where(mask, vid, jnp.int32(2**30))  # invalid sorts last

    order = jnp.argsort(vid)
    vid_s = vid[order]
    valid_s = mask[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (vid_s[1:] != vid_s[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(new_seg) - 1  # (N,) segment id in voxel-id order
    num_valid = jnp.where(
        jnp.any(valid_s), jnp.max(jnp.where(valid_s, seg, -1)) + 1, 0
    ).astype(jnp.int32)
    # invalid points and overflow voxels route to the trash segment max_out
    seg = jnp.where(valid_s & (seg < max_out), seg, max_out)

    ones = valid_s.astype(jnp.float32) * (seg < max_out)
    counts = jax.ops.segment_sum(
        ones, seg, num_segments=max_out + 1, indices_are_sorted=True
    )[:-1]
    psum = jax.ops.segment_sum(
        points[order] * ones[:, None], seg, max_out + 1, indices_are_sorted=True
    )[:-1]
    out_mask = counts > 0
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_points = masked_points(psum / denom, out_mask)

    out_features = None
    if features is not None:
        fsum = jax.ops.segment_sum(
            features[order] * ones[:, None], seg, max_out + 1,
            indices_are_sorted=True,
        )[:-1]
        out_features = fsum / denom

    out_labels = None
    if labels is not None:
        lab = labels[order]
        lab_valid = ones * (lab >= 0)
        onehot = jax.nn.one_hot(jnp.clip(lab, 0), num_classes) * lab_valid[:, None]
        votes = jax.ops.segment_sum(
            onehot, seg, max_out + 1, indices_are_sorted=True
        )[:-1]
        maj = jnp.argmax(votes, axis=-1).astype(jnp.int32)
        has_vote = jnp.sum(votes, axis=-1) > 0
        out_labels = jnp.where(out_mask & has_vote, maj, ignore_label)

    return GridSubsampleResult(out_points, out_mask, out_features, out_labels, num_valid)


def grid_subsample(
    points: jnp.ndarray,
    cell_size: float,
    max_out: int,
    mask: Optional[jnp.ndarray] = None,
    features: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    num_classes: int = 20,
    ignore_label: int = -1,
) -> GridSubsampleResult:
    """Voxel-grid subsampling: per-voxel barycenter / mean feature / majority label.

    Static-shape reformulation of grid_subsampling.cpp: voxels are emitted in
    ascending voxel-id order into a fixed (max_out, ...) buffer with a
    validity mask. Each voxel spans ``cell_size`` metres; the grid origin is
    the floor of the valid points' min corner (grid_subsampling.cpp:53-56).
    Coordinates are limited to 1024 cells per axis relative to that corner
    (ample for sphere inputs; callers tile larger scenes).

    Accepts (N, 3) or (B, N, 3) inputs (plus matching mask/features/labels).
    """
    core = functools.partial(
        _grid_subsample_core,
        cell_size=cell_size,
        max_out=max_out,
        num_classes=num_classes,
        ignore_label=ignore_label,
    )
    if points.ndim == 2:
        m = jnp.ones(points.shape[:1], bool) if mask is None else mask
        return core(points, m, features, labels)
    b, n = points.shape[:2]
    m = jnp.ones((b, n), bool) if mask is None else mask
    in_axes = (0, 0, None if features is None else 0, None if labels is None else 0)
    return jax.vmap(core, in_axes=in_axes)(points, m, features, labels)
