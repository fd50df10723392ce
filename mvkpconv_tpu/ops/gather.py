"""Gather ops.

TPU-native replacement for mvpnet/ops/cuda/group_points_kernel.cu (forward
gather + backward scatter-add) and KPConv-PyTorch/models/blocks.py:35-66
(``gather``). In JAX a gather is ``take_along_axis`` and its VJP is the
scatter-add automatically — no custom backward needed.

Layout note: the reference uses channels-first (B, C, N); we use
channels-last (..., N, C), the natural layout for TPU (last dim = lanes).
"""

from __future__ import annotations

import jax.numpy as jnp


def group_points(features: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point features at neighbor indices.

    Args:
      features: (..., Ns, C) — supports features. If callers use shadow
        indices (== Ns) they must pass features padded with a zero row at Ns
        (see ``pad_shadow_row``).
      index: (..., Nq, K) int32 indices into the Ns axis.

    Returns:
      (..., Nq, K, C) gathered features. Differentiable (VJP = scatter-add,
      matching group_points_kernel.cu backward).

    Perf note: the batch dims are folded into the row axis and gathered with
    a single flat ``jnp.take`` — measured 3× faster on TPU than the batched
    ``take_along_axis`` lowering (the gather is start-bound at ~340-440M
    starts/s in flat form, independent of payload and source size).
    """
    batch_shape = index.shape[:-2]
    nq, k = index.shape[-2], index.shape[-1]
    ns, c = features.shape[-2], features.shape[-1]
    if batch_shape != features.shape[:-2]:
        raise ValueError(
            f"batch dims mismatch: features {features.shape} index {index.shape}"
        )
    b = 1
    for d in batch_shape:
        b *= d
    flat_feat = features.reshape(b * ns, c)
    row_base = (jnp.arange(b, dtype=index.dtype) * ns).reshape(
        (b,) + (1,) * (index.ndim - len(batch_shape))
    )
    flat_idx = (index.reshape((b,) + index.shape[len(batch_shape):]) + row_base)
    out = jnp.take(flat_feat, flat_idx.reshape(-1), axis=0)
    return out.reshape(batch_shape + (nq, k, c))


def pad_shadow_row(features: jnp.ndarray) -> jnp.ndarray:
    """Append a zero feature row so shadow index Ns selects zeros.

    Mirrors blocks.py:357 (``x = cat((x, zeros_like(x[:1])))``).
    """
    pad = [(0, 0)] * features.ndim
    pad[-2] = (0, 1)
    return jnp.pad(features, pad)


def batch_index_select(values: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Select rows of (..., N, C) by (..., M) indices → (..., M, C).

    Replacement for common/nn/functional.py:127-150 ``batch_index_select``.
    """
    return jnp.take_along_axis(values, index[..., None], axis=-2)
