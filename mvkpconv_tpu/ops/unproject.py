"""Depth unprojection and on-device 2D→3D pixel-to-point association.

Replaces the reference's CPU-side geometry in the dataloader:
  * ``depth2xyz`` (mvpnet/data/scannet_2d3d.py:33-39): pinhole unprojection
    x=(u−cx)·z/fx, y=(v−cy)·z/fy;
  * camera-pose transform + valid-depth masking (scannet_2d3d.py:252-281);
  * the sklearn 3-NN from points to valid pixels (scannet_2d3d.py:309-313),
    which here is the on-device ``knn`` over shadow-masked pixel clouds —
    fused into the jitted step instead of burning dataloader CPUs.

Conventions: depth (B, V, H, W) float32 metres, 0 = invalid; intrinsics
(B, V, 3, 3); cam-to-world poses (B, V, 4, 4). Invalid pixels are placed at
``SHADOW_COORD`` so neighbor searches ignore them naturally.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mvkpconv_tpu.ops.common import SHADOW_COORD
from mvkpconv_tpu.ops.neighbors import knn


def unproject_depth(
    depth: jnp.ndarray, intrinsics: jnp.ndarray, poses: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject depth maps to world coordinates.

    Args:
      depth: (B, V, H, W) metres; <= 0 marks invalid pixels.
      intrinsics: (B, V, 3, 3) pinhole K.
      poses: (B, V, 4, 4) camera-to-world transforms.

    Returns:
      (image_xyz, valid): (B, V, H, W, 3) world positions with invalid pixels
      at SHADOW_COORD, and the (B, V, H, W) bool validity mask.
    """
    b, v, h, w = depth.shape
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    z = depth
    x = (us - cx) * z / fx
    y = (vs - cy) * z / fy
    cam = jnp.stack([x, y, z], axis=-1)  # (B, V, H, W, 3)
    rot = poses[..., :3, :3]
    trans = poses[..., :3, 3]
    world = (
        jnp.einsum("bvij,bvhwj->bvhwi", rot, cam) + trans[:, :, None, None, :]
    )
    valid = depth > 0
    world = jnp.where(valid[..., None], world, SHADOW_COORD)
    return world, valid


def points_to_pixel_knn(
    points: jnp.ndarray, image_xyz: jnp.ndarray, k: int = 3, method: str = "exact"
) -> jnp.ndarray:
    """3-NN indices from 3D points into the flattened multi-view pixel cloud.

    Args:
      points: (B, N, 3) target points.
      image_xyz: (B, V, H, W, 3) unprojected pixels (invalid at SHADOW_COORD).
      k: pixel neighbors per point (reference uses 3).

    Returns:
      (B, N, k) int32 indices into the V·H·W axis, directly consumable by
      ``group_points`` on (B, V·H·W, C) per-pixel features.
    """
    b = image_xyz.shape[0]
    flat = image_xyz.reshape(b, -1, 3)
    idx, _ = knn(points, flat, k, method=method)
    return idx
