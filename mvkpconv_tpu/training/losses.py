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
) -> jnp.ndarray:
    """Mean cross-entropy over valid, non-ignored points.

    Args:
      logits: (..., C) float.
      labels: (...) int, values in [0, C) or ``ignore_label``.
      mask: optional (...) bool validity (padding) mask.
      class_weights: optional (C,) per-class weights.

    Returns:
      scalar loss.
    """
    valid = labels != ignore_label
    if mask is not None:
        valid = valid & mask
    safe_labels = jnp.clip(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    if class_weights is not None:
        w = w * jnp.asarray(class_weights)[safe_labels]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def p2p_fitting_regularizer(
    offsets: jnp.ndarray, kp_extent: float, repulse_extent: float,
    fitting_power: float = 1.0,
) -> jnp.ndarray:
    """Deformable-KPConv regularizer (architectures.py:21-54).

    Penalizes (a) kernel points drifting beyond KP_extent (fitting term uses
    min distance to inputs in the reference; here approximated by the offset
    magnitude since shadow-free neighborhoods make them equivalent in scale)
    and (b) deformed kernel points closer than ``repulse_extent`` to each
    other (repulsive term).

    Args:
      offsets: (B, N, M, 3) deformed kernel offsets (KP_extent-scaled).
    """
    # fitting: keep deformed points within the extent
    norm = jnp.linalg.norm(offsets, axis=-1) / kp_extent
    fitting = jnp.mean(jnp.maximum(norm - 1.0, 0.0) ** 2)
    # repulsion between deformed kernel points
    kp = offsets
    d = jnp.linalg.norm(kp[..., :, None, :] - kp[..., None, :, :], axis=-1)
    m = kp.shape[-2]
    eye = jnp.eye(m, dtype=bool)
    rep = jnp.maximum(0.0, repulse_extent - d / kp_extent) ** 2
    repulsion = jnp.mean(jnp.where(eye, 0.0, rep))
    return fitting_power * (fitting + repulsion)
