"""ContFuse-style 2D→3D feature aggregation (Flax).

Re-design of mvpnet/models/mvpnet_3d.py:12-70 (FeatureAggregation): for each
3D point, take its K unprojected pixel neighbors, build the relation feature
[Δxyz, ‖Δxyz‖²], run a shared 1×1 MLP over (feature ⊕ relation) and
sum-reduce over K. Channels-last: features (B, N, K, C), points (B, N, 3).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class SharedMLP(nn.Module):
    """Dense + BN + ReLU stack applied pointwise (common/nn SharedMLP)."""

    channels: Tuple[int, ...]
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype, name=f"dense{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, name=f"bn{i}"
                )(x)
            x = nn.relu(x)
        return x


class FeatureAggregation(nn.Module):
    in_channels: int = 64
    mlp_channels: Tuple[int, ...] = (64, 64, 64)
    reduction: str = "sum"
    use_relation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        src_xyz: jnp.ndarray,  # (B, N, K, 3) unprojected pixel positions
        tgt_xyz: jnp.ndarray,  # (B, N, 3) target point positions
        feature: jnp.ndarray,  # (B, N, K, C) lifted 2D features
        train: bool = False,
    ) -> jnp.ndarray:
        x = feature
        if self.mlp_channels:
            if self.use_relation:
                diff = src_xyz - tgt_xyz[:, :, None, :]
                dist = jnp.sum(diff * diff, axis=-1, keepdims=True)
                x = jnp.concatenate([feature, diff, dist], axis=-1)
            x = SharedMLP(self.mlp_channels, dtype=self.dtype, name="mlp")(x, train)
        if self.reduction == "sum":
            return jnp.sum(x, axis=2)
        if self.reduction == "max":
            return jnp.max(x, axis=2)
        raise ValueError(f"unknown reduction {self.reduction!r}")
