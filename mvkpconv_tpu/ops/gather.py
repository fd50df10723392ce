"""Gather ops.

TPU-native replacement for mvpnet/ops/cuda/group_points_kernel.cu (forward
gather + backward scatter-add) and KPConv-PyTorch/models/blocks.py:35-66
(``gather``). In JAX a gather is ``take_along_axis`` and its VJP is the
scatter-add automatically — no custom backward needed.

Layout note: the reference uses channels-first (B, C, N); we use
channels-last (..., N, C), the natural layout for TPU (last dim = lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def _flatten_index(index, batch_shape, ns):
    """Fold batch dims into a flat row index (the flat-take form)."""
    b = 1
    for d in batch_shape:
        b *= d
    row_base = (jnp.arange(b, dtype=index.dtype) * ns).reshape(
        (b,) + (1,) * (index.ndim - len(batch_shape))
    )
    flat = index.reshape((b,) + index.shape[len(batch_shape):]) + row_base
    return flat.reshape(-1), b


@jax.custom_vjp
def group_points_packed(xyz: jnp.ndarray, feat: jnp.ndarray,
                        index: jnp.ndarray):
    """Fused position⊕feature gather with the bf16 features PACKED into
    f32 lanes, so both ride ONE flat take from a half-size source.

    Motivation (measured, scratch/prof_lift_gather.py): gather start rate
    is source-BYTE-sensitive at large sources — 197k starts from a
    (384k, 67) f32 source run at 65M starts/s but at 144M from the same
    source in bf16. The 2D→3D lift gathers [xyz (f32, exactness required
    for the relation features) ⊕ 64 bf16 UNet channels]; bitcasting the
    bf16 pairs into 32 f32 lanes keeps xyz exact while shrinking the
    source from 103 MB to 54 MB — numerically EXACT on both parts (the
    features are bf16 upstream and downstream either way).

    Args:
      xyz:  (..., Ns, 3) float32.
      feat: (..., Ns, C) bfloat16, C even.
      index: (..., Nq, K) int32 into Ns — must be valid rows (the pixel
        kNN guarantees in-bounds indices; no shadow contract here).

    Returns:
      (gathered_xyz (..., Nq, K, 3) f32, gathered_feat (..., Nq, K, C)
      bf16). Differentiable in xyz and feat (custom VJP: two scatter-adds
      — `lax.bitcast_convert_type` has no autodiff rule, hence the
      custom_vjp rather than relying on XLA).
    """
    out, _ = _group_points_packed_fwd(xyz, feat, index)
    return out


def _group_points_packed_fwd(xyz, feat, index):
    if feat.dtype != jnp.bfloat16 or xyz.dtype != jnp.float32:
        raise ValueError(f"need f32 xyz + bf16 feat, got {xyz.dtype}/{feat.dtype}")
    c = feat.shape[-1]
    if c % 2:
        raise ValueError(f"feature channels must be even to pack, got {c}")
    batch_shape = index.shape[:-2]
    nq, k = index.shape[-2], index.shape[-1]
    ns = xyz.shape[-2]
    packed = jax.lax.bitcast_convert_type(
        feat.reshape(feat.shape[:-1] + (c // 2, 2)), jnp.float32
    )  # (..., Ns, C//2) f32 carrying bf16 pairs
    payload = jnp.concatenate([xyz, packed], axis=-1)  # (..., Ns, 3 + C//2)
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    rows = jnp.take(payload.reshape(b * ns, 3 + c // 2), flat_idx, axis=0)
    rows = rows.reshape(batch_shape + (nq, k, 3 + c // 2))
    g_xyz = rows[..., :3]
    g_feat = jax.lax.bitcast_convert_type(
        rows[..., 3:], jnp.bfloat16
    ).reshape(batch_shape + (nq, k, c))
    return (g_xyz, g_feat), (index, batch_shape, ns, c)


def _group_points_packed_bwd(res, cts):
    index, batch_shape, ns, c = res
    ct_xyz, ct_feat = cts
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    d_xyz = (
        jnp.zeros((b * ns, 3), ct_xyz.dtype)
        .at[flat_idx].add(ct_xyz.reshape(-1, 3))
        .reshape(batch_shape + (ns, 3))
    )
    ctf = ct_feat.astype(jnp.float32)
    d_feat = (
        jnp.zeros((b * ns, c), jnp.float32)
        .at[flat_idx].add(ctf.reshape(-1, c))
        .reshape(batch_shape + (ns, c))
        .astype(jnp.bfloat16)
    )
    d_index = np.zeros(index.shape, dtype=jax.dtypes.float0)
    return d_xyz, d_feat, d_index


group_points_packed.defvjp(
    lambda xyz, feat, index: _group_points_packed_fwd(xyz, feat, index),
    _group_points_packed_bwd,
)


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
