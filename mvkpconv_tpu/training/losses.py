"""Segmentation losses.

Replaces mvpnet/models/loss.py (SegLoss: CE with ignore −100 and optional
log label weights) and the KPFCNN loss path (architectures.py:307-311,
345-375: weighted CE with ignored labels remapped to −1). Labels arrive
already mapped to [0, C) with ``ignore_label`` for ignored; padded slots are
excluded via ``mask``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segmentation_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_label: int = -1,
    label_smoothing: float = 0.0,
    balance: str = "none",
) -> jnp.ndarray:
    """Mean cross-entropy over valid, non-ignored points.

    Args:
      logits: (..., C) float.
      labels: (...) int, values in [0, C) or ``ignore_label``.
      mask: optional (...) bool validity (padding) mask.
      class_weights: optional (C,) per-class weights (the reference's
        ``config.class_w`` weighted CE, architectures.py:307-311).
      label_smoothing: smooth the one-hot target to
        ``(1−ε)·onehot + ε/C`` (common/nn/functional.py:100-119
        ``smooth_cross_entropy``).
      balance: 'none' | 'class' — the reference's ``segloss_balance``
        switch; 'class' reweights by inverse in-batch class frequency
        (total/(C·count)) when no explicit ``class_weights`` are given.

    Returns:
      scalar loss.
    """
    c = logits.shape[-1]
    valid = labels != ignore_label
    if mask is not None:
        valid = valid & mask
    safe_labels = jnp.clip(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        nll = (1.0 - label_smoothing) * nll + label_smoothing * (
            -jnp.mean(logp, axis=-1)
        )
    w = valid.astype(jnp.float32)
    if class_weights is None and balance == "class":
        counts = jnp.sum(
            jax.nn.one_hot(safe_labels, c) * w[..., None],
            axis=tuple(range(w.ndim)),
        )
        total = jnp.maximum(jnp.sum(counts), 1.0)
        class_weights = total / (c * jnp.maximum(counts, 1.0))
    if class_weights is not None:
        w = w * jnp.asarray(class_weights)[safe_labels]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def p2p_fitting_regularizer(
    min_d2_norm: jnp.ndarray,
    kp_locs_norm: jnp.ndarray,
    repulse_extent: float = 1.2,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-layer deformable-KPConv regularizer — architectures.py:21-54 math.

    Args:
      min_d2_norm: (B, N, M) min squared distance from each deformed kernel
        point to a real neighbor, already normalized by KP_extent² (sown by
        KPConvLayer as 'deform_min_d2').
      kp_locs_norm: (B, N, M, 3) deformed kernel positions / KP_extent
        (sown as 'deform_kp_locs').
      repulse_extent: repulsion distance in extent units (config 1.2).
      mask: optional (B, N) query validity — padded rows are excluded from
        both normalizations (the reference means over real stacked points
        only, so without this the regularizer weight would scale with each
        batch's padding fraction).

    Returns:
      (fitting, repulsion) pair; the model-level loss combines them as
      power · (2·Σ fitting + Σ repulsion) over deformable layers.
    """
    m_kp = min_d2_norm.shape[-1]
    if mask is None:
        w = jnp.ones(min_d2_norm.shape[:-1], jnp.float32)
    else:
        w = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w) * m_kp, 1.0)
    fitting = jnp.sum(min_d2_norm * w[..., None]) / denom
    locs = kp_locs_norm
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum(
                (locs[..., :, None, :] - jax.lax.stop_gradient(locs)[..., None, :, :])
                ** 2,
                axis=-1,
            ),
            1e-12,
        )
    )  # (B, N, M, M)
    m = locs.shape[-2]
    eye = jnp.eye(m, dtype=bool)
    rep = jnp.minimum(d - repulse_extent, 0.0) ** 2
    rep = jnp.where(eye, 0.0, rep)
    rep_sum = jnp.sum(rep, axis=-1)  # (B, N, M)
    repulsion = jnp.sum(rep_sum * w[..., None]) / denom
    return fitting, repulsion


def deform_regularization(
    intermediates,
    repulse_extent: float = 1.2,
    fitting_power: float = 1.0,
) -> jnp.ndarray:
    """Aggregate the deformable regularizer over all sown KPConv layers.

    Walks the 'intermediates' collection for 'deform_min_d2' /
    'deform_kp_locs' pairs (blocks.KPConvLayer sows one per deformable
    conv) and returns power · (2·fitting + repulsion) like
    p2p_fitting_regularizer in the reference.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(intermediates), sep="/"
    )
    fitting = 0.0
    repulsion = 0.0
    found = False
    for key, value in flat.items():
        if key.endswith("deform_min_d2"):
            locs_key = key.replace("deform_min_d2", "deform_kp_locs")
            min_d2 = value[0] if isinstance(value, tuple) else value
            locs = flat[locs_key]
            locs = locs[0] if isinstance(locs, tuple) else locs
            mask = flat.get(key.replace("deform_min_d2", "deform_mask"))
            if isinstance(mask, tuple):
                mask = mask[0]
            f, r = p2p_fitting_regularizer(min_d2, locs, repulse_extent, mask)
            fitting = fitting + f
            repulsion = repulsion + r
            found = True
    if not found:
        return jnp.zeros(())
    return fitting_power * (2.0 * fitting + repulsion)
