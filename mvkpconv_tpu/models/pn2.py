"""PointNet++ single-scale-grouping segmentation network (Flax).

Re-design of mvpnet/models/pn2/{modules.py,pn2ssg.py}: SetAbstraction
(FPS → ball query → shared MLP → max), FeaturePropagation (3-NN inverse
distance interpolation → shared MLP), and the PN2SSG segmentation model with
the reference's default hyperparameters (pn2ssg.py:22-34: centroids
2048/512/128/32, radii .1/.2/.4/.8, K=32).

All neighbor ops run on device through :mod:`mvkpconv_tpu.ops` (the
reference calls its CUDA layer inside ``torch.no_grad()``; here index
computations are integer outputs so no gradients flow by construction).
Channels-last layout (B, N, C); chunks are resampled to a fixed size by the
data pipeline so no masks are needed on this path (scannet_2d3d.py:337-381
resamples every chunk to num_points).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvkpconv_tpu.models.feature_aggregation import SharedMLP
from mvkpconv_tpu.ops import (
    ball_query,
    batch_index_select,
    farthest_point_sample,
    group_points,
    three_nn_interpolate,
)


class SetAbstraction(nn.Module):
    mlp_channels: Tuple[int, ...]
    num_centroids: int
    radius: float
    max_neighbors: int
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feature=None, train: bool = False):
        """xyz (B, N, 3), feature (B, N, C) → (B, M, 3), (B, M, C')."""
        centroids = jax.lax.stop_gradient(
            farthest_point_sample(xyz, self.num_centroids)
        )
        new_xyz = batch_index_select(xyz, centroids)  # (B, M, 3)
        idx = jax.lax.stop_gradient(
            ball_query(new_xyz, xyz, self.radius, self.max_neighbors)
        )
        group_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if feature is not None:
            group_feature = group_points(feature, idx)
            if self.use_xyz:
                group_feature = jnp.concatenate([group_feature, group_xyz], axis=-1)
        else:
            group_feature = group_xyz
        h = SharedMLP(self.mlp_channels, dtype=self.dtype, name="mlp")(
            group_feature, train
        )
        return new_xyz, jnp.max(h, axis=2)


class FeaturePropagation(nn.Module):
    mlp_channels: Tuple[int, ...]
    num_neighbors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, dense_xyz, sparse_xyz, dense_feature, sparse_feature,
                 train: bool = False):
        interpolated = three_nn_interpolate(dense_xyz, sparse_xyz, sparse_feature)
        if dense_feature is not None:
            interpolated = jnp.concatenate([interpolated, dense_feature], axis=-1)
        return SharedMLP(self.mlp_channels, dtype=self.dtype, name="mlp")(
            interpolated, train
        )


class PN2SSG(nn.Module):
    """PointNet++ SSG segmentation (pn2ssg.py defaults)."""

    num_classes: int = 20
    sa_channels: Tuple[Tuple[int, ...], ...] = (
        (32, 32, 64),
        (64, 64, 128),
        (128, 128, 256),
        (256, 256, 512),
    )
    num_centroids: Tuple[int, ...] = (2048, 512, 128, 32)
    radius: Tuple[float, ...] = (0.1, 0.2, 0.4, 0.8)
    max_neighbors: Tuple[int, ...] = (32, 32, 32, 32)
    fp_channels: Tuple[Tuple[int, ...], ...] = (
        (256, 256),
        (256, 256),
        (256, 128),
        (128, 128, 128),
    )
    dropout: float = 0.5
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, feature=None, train: bool = False):
        """points (B, N, 3), feature (B, N, C) → logits (B, N, num_classes)."""
        xyz_list = [points]
        # the reference drops the input feature from the FP skip list
        # (pn2ssg.py:66-69: feature_channels = [0])
        sa_features = [None]
        x = feature
        for i in range(len(self.sa_channels)):
            points, x = SetAbstraction(
                self.sa_channels[i],
                self.num_centroids[i],
                self.radius[i],
                self.max_neighbors[i],
                self.use_xyz,
                self.dtype,
                name=f"sa{i}",
            )(points, x, train)
            xyz_list.append(points)
            sa_features.append(x)
        for i in range(len(self.fp_channels)):
            x = FeaturePropagation(
                self.fp_channels[i], dtype=self.dtype, name=f"fp{i}"
            )(
                xyz_list[-2 - i],
                xyz_list[-1 - i],
                sa_features[-2 - i],
                x,
                train,
            )
        x = SharedMLP((128,), dtype=self.dtype, name="mlp_seg")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="seg_logit")(x)
