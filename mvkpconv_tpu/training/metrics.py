"""Segmentation metrics: confusion matrices, IoU, accuracy.

Replaces KPConv-PyTorch/utils/metrics.py (fast_confusion via bincount,
IoU_from_confusions with absent-class mIoU placeholder, metrics.py:206-232)
and mvpnet/models/metric.py (SegAccuracy / SegIoU).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    mask: Optional[jnp.ndarray] = None,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """(C, C) confusion with rows = true, cols = pred (bincount trick)."""
    valid = label != ignore_label
    if mask is not None:
        valid = valid & mask
    idx = jnp.clip(label, 0) * num_classes + jnp.clip(pred, 0, num_classes - 1)
    flat = jnp.where(valid.reshape(-1), idx.reshape(-1), num_classes * num_classes)
    counts = jnp.bincount(flat, length=num_classes * num_classes + 1)[:-1]
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(conf) -> np.ndarray:
    """Per-class IoU; absent classes get the present-class mIoU placeholder
    (metrics.py:229-231) so they don't skew averages."""
    conf = np.asarray(conf, np.float64)
    tp = np.diag(conf)
    fp = conf.sum(0) - tp
    fn = conf.sum(1) - tp
    denom = tp + fp + fn
    present = denom > 0
    iou = np.zeros_like(tp)
    iou[present] = tp[present] / denom[present]
    if present.any():
        iou[~present] = iou[present].mean()
    return iou


def accuracy_from_confusion(conf) -> float:
    conf = np.asarray(conf, np.float64)
    total = conf.sum()
    return float(np.diag(conf).sum() / max(total, 1.0))


def rescale_confusion_to_proportions(conf, true_proportions) -> np.ndarray:
    """Rebalance confusion rows to match true class proportions — the
    validation rescaling in trainer.py:421-433 (sphere sampling over-samples
    some classes; rows are rescaled so IoU reflects the full clouds)."""
    conf = np.asarray(conf, np.float64)
    row = conf.sum(1)
    scale = np.where(row > 0, np.asarray(true_proportions, np.float64) / np.maximum(row, 1e-9), 0.0)
    return conf * scale[:, None]
