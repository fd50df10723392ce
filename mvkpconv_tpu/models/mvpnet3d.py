"""MVPNet: multi-view 2D features lifted onto points, then PointNet++.

Re-design of mvpnet/models/mvpnet_3d.py:73-135 (MVPNet3D): run the 2D UNet
on every view, gather per-point pixel neighbors by precomputed kNN indices
(pixel → point association computed on device by the data path, replacing
the reference's CPU sklearn kNN, scannet_2d3d.py:309-313), aggregate with
FeatureAggregation, feed PN2SSG.

The 2D network is typically frozen (reference FROZEN_PATTERNS net_2d): pass
``freeze_2d=True`` and the caller's optimizer masks out ``net_2d`` params
(training/optim.py); batch stats of the frozen net are not updated because
the 2D forward runs with train=False in that case.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvkpconv_tpu.models.feature_aggregation import FeatureAggregation
from mvkpconv_tpu.models.pn2 import PN2SSG
from mvkpconv_tpu.models.unet2d import UNetResNet34
from mvkpconv_tpu.ops import group_points, points_to_pixel_knn, unproject_depth
from mvkpconv_tpu.ops.unproject import points_to_pixel_knn_projective


class MVPNet3D(nn.Module):
    num_classes: int = 20
    feat_channels: int = 64
    freeze_2d: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.net_2d = UNetResNet34(self.num_classes, dtype=self.dtype)
        self.feat_aggreg = FeatureAggregation(self.feat_channels, dtype=self.dtype)
        self.net_3d = PN2SSG(self.num_classes, dtype=self.dtype)

    def lift_2d_features(self, images, image_xyz, knn_indices, train: bool):
        """Run the 2D net on all views and gather per-point pixel features.

        Args:
          images: (B, V, H, W, 3) normalized RGB.
          image_xyz: (B, V, H, W, 3) unprojected world coordinates per pixel.
          knn_indices: (B, N, K) int32 indices into the flattened V·H·W axis.

        Returns:
          feature_2d (B, N, K, C), pixel_xyz (B, N, K, 3).
        """
        b, v, h, w, _ = images.shape
        flat = images.reshape(b * v, h, w, 3)
        train_2d = train and not self.freeze_2d
        preds = self.net_2d(flat, train=train_2d)
        feat = preds["feature"].reshape(b, v * h * w, -1)
        if self.freeze_2d:
            feat = jax.lax.stop_gradient(feat)
        feature_2d = group_points(feat, knn_indices)
        pixel_xyz = group_points(image_xyz.reshape(b, v * h * w, 3), knn_indices)
        return feature_2d, pixel_xyz

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        points = batch["points"]  # (B, N, 3)
        if "image_xyz" in batch:
            image_xyz = batch["image_xyz"]
        else:  # on-device unprojection from raw RGB-D geometry
            image_xyz, _ = unproject_depth(
                batch["depth"], batch["intrinsics"], batch["poses"]
            )
        if "knn_indices" in batch:
            knn_indices = batch["knn_indices"]
        elif "poses" in batch:
            knn_indices = points_to_pixel_knn_projective(
                points, image_xyz, batch["intrinsics"], batch["poses"], 3
            )
        else:
            knn_indices = points_to_pixel_knn(points, image_xyz, 3, method="approx")
        feature_2d, pixel_xyz = self.lift_2d_features(
            batch["images"], image_xyz, knn_indices, train
        )
        feature_2d3d = self.feat_aggreg(pixel_xyz, points, feature_2d, train)
        return self.net_3d(points, feature_2d3d, train)
