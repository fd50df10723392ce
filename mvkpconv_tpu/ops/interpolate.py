"""3-NN feature interpolation.

TPU-native replacement for mvpnet/ops/cuda/interpolate_kernel.cu (forward
weighted-sum gather + scatter-add backward — the VJP of a gather in JAX) and
the surrounding FeatureInterpolator logic (mvpnet/models/pn2/modules.py:116-153):
inverse-distance weights over the 3 nearest key points.
"""

from __future__ import annotations

import jax.numpy as jnp

from mvkpconv_tpu.ops.gather import group_points
from mvkpconv_tpu.ops.neighbors import knn


def feature_interpolate(
    features: jnp.ndarray, index: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted sum of K neighbor features.

    Args:
      features: (..., Ns, C) key features.
      index: (..., Nq, K) int32 neighbor indices into Ns.
      weight: (..., Nq, K) float weights.

    Returns:
      (..., Nq, C). Differentiable w.r.t. ``features`` and ``weight``.
    """
    gathered = group_points(features, index)  # (..., Nq, K, C)
    return jnp.sum(gathered * weight[..., None], axis=-2)


def three_nn_interpolate(
    query_xyz: jnp.ndarray,
    key_xyz: jnp.ndarray,
    key_features: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Interpolate key features onto query points via inverse-distance 3-NN.

    Matches FeatureInterpolator (pn2/modules.py:135-142): weights are
    1/max(d², eps) normalized over the 3 neighbors.
    """
    index, sqdist = knn(query_xyz, key_xyz, 3)
    inv = 1.0 / jnp.maximum(sqdist, eps)
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return feature_interpolate(key_features, index, weight.astype(key_features.dtype))
