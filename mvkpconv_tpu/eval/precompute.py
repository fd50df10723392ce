"""Whole-scene 2D→3D feature precompute.

Re-design of the reference's offline feature route: ``ScanNet2D3DWhole``
(mvpnet/data/scannet_2d3d.py:617-1092 — whole scene + frames covering it)
feeding ``get_2d3dfeature`` (mvpnet/models/mvpnet_3d.py:231-279: frozen UNet
over all frames → per-point k-pixel gather → FeatureAggregation → cached
per-scene features), consumed per-sphere by ``architectures_new.py`` /
``ScanNet_new.py`` via ``input_inds`` slicing.

Here the whole pass is one jitted device program per point chunk: UNet over
all frames once, then projective pixel-kNN + gather + aggregation over
fixed-size point chunks. Output: an (N, feature_2d_dim) array per scene,
stored on the scene dict under ``feature_2d3d`` — SphereDataset slices it
per sphere and MVKPConv consumes it instead of running the 2D net in-graph.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models.feature_aggregation import FeatureAggregation
from mvkpconv_tpu.models.unet2d import UNetResNet34
from mvkpconv_tpu.ops import group_points
from mvkpconv_tpu.ops.unproject import (
    points_to_pixel_knn_projective,
    unproject_depth,
)


def precompute_scene_2d3d_features(
    scene: Dict[str, np.ndarray],
    cfg,
    unet_variables,
    fa_variables: Optional[dict] = None,
    point_chunk: int = 4096,
    rng_seed: int = 0,
) -> np.ndarray:
    """(N, feature_2d_dim) lifted 2D features for every scene point.

    Args:
      scene: dict with points (N,3) + rgb/depth/poses/intrinsics over ALL
        frames (the whole-scene frame set, num_rgbd_frames=30 in the
        reference's ScanNet2D3DWhole).
      cfg: KPConfig (feature_2d_dim, pixel_knn, pixel_window, num_classes).
      unet_variables: the trained 2D UNet's {'params','batch_stats'}.
      fa_variables: FeatureAggregation variables; None initializes fresh
        ones (the reference's precompute script also aggregates with an
        untrained FeatureAggregation, mvpnet_3d.py:270).
    """
    unet = UNetResNet34(cfg.num_classes, dtype=cfg.compute_dtype)
    fa = FeatureAggregation(cfg.feature_2d_dim, dtype=cfg.compute_dtype)

    images = jnp.asarray(scene["rgb"], jnp.float32)  # (F, H, W, 3)
    f, h, w, _ = images.shape
    feat_2d = jax.jit(
        lambda v, im: unet.apply(v, im, train=False)["feature"]
    )(unet_variables, images)
    feat_flat = feat_2d.reshape(1, f * h * w, -1)

    depth = jnp.asarray(scene["depth"])[None]
    intr = jnp.asarray(scene["intrinsics"])[None]
    poses = jnp.asarray(scene["poses"])[None]
    image_xyz, _ = jax.jit(unproject_depth)(depth, intr, poses)
    xyz_flat = image_xyz.reshape(1, f * h * w, 3)

    if fa_variables is None:
        fa_variables = fa.init(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, point_chunk, cfg.pixel_knn, 3)),
            jnp.zeros((1, point_chunk, 3)),
            jnp.zeros((1, point_chunk, cfg.pixel_knn, cfg.feature_2d_dim)),
            False,
        )

    @jax.jit
    def lift_chunk(pts):
        knn_idx = points_to_pixel_knn_projective(
            pts, image_xyz, intr, poses, cfg.pixel_knn,
            window=cfg.pixel_window,
        )
        pix_feat = group_points(feat_flat, knn_idx)
        pix_xyz = group_points(xyz_flat, knn_idx)
        return fa.apply(fa_variables, pix_xyz, pts, pix_feat, False)

    points = np.asarray(scene["points"], np.float32)
    n = len(points)
    out = np.zeros((n, cfg.feature_2d_dim), np.float32)
    for start in range(0, n, point_chunk):
        chunk = points[start : start + point_chunk]
        pad = point_chunk - len(chunk)
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        got = np.asarray(lift_chunk(jnp.asarray(chunk)[None]))[0]
        out[start : start + point_chunk - pad] = got[: point_chunk - pad]
    return out


def attach_precomputed_features(
    scenes: Sequence[Dict[str, np.ndarray]],
    cfg,
    unet_variables,
    fa_variables: Optional[dict] = None,
    drop_views: bool = True,
) -> list:
    """Subsample each scene at ``first_subsampling_dl`` and attach
    ``feature_2d3d`` computed on the subsampled points (the coordinates the
    sphere sampler indexes). Optionally drops the raw frames — the
    precomputed route no longer needs them per batch, which is the point of
    the reference's offline cache. Feed the result to
    ``SphereDataset(..., subsample=False)``."""
    from mvkpconv_tpu.data.spheres import grid_subsample_np

    out = []
    for scene in scenes:
        pts, cols, lab = grid_subsample_np(
            scene["points"], scene["colors"], scene["labels"],
            cfg.first_subsampling_dl, cfg.num_classes,
        )
        sub = dict(scene, points=pts, colors=cols, labels=lab)
        feats = precompute_scene_2d3d_features(
            sub, cfg, unet_variables, fa_variables
        )
        sub["feature_2d3d"] = feats
        if drop_views:
            for k in ("rgb", "depth", "poses", "intrinsics"):
                sub.pop(k, None)
        out.append(sub)
    return out
