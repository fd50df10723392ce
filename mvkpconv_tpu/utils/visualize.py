"""Qualitative outputs: colored prediction clouds, error maps.

Replaces mvpnet/utils/visualize.py (SCANNET_COLOR_PALETTE coloring,
pc_with_labels) and the trainer/tester ply dumps (potentials, predictions —
utils/trainer.py:483-517, tester.py:320-365). Mayavi-based interactive
inspectors are out of scope for a headless TPU environment; everything is
dumped as PLY for external viewers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from mvkpconv_tpu.data.meta import SCANNET_COLOR_PALETTE
from mvkpconv_tpu.utils.ply import write_ply


def labels_to_colors(labels: np.ndarray, ignore_color=(0, 0, 0)) -> np.ndarray:
    """(N,) int labels → (N, 3) uint8 palette colors; ignore (<0) → black."""
    palette = np.asarray(SCANNET_COLOR_PALETTE, np.uint8)
    lab = np.asarray(labels)
    out = palette[np.clip(lab, 0, len(palette) - 1) % len(palette)]
    out = np.where((lab < 0)[:, None], np.asarray(ignore_color, np.uint8), out)
    return out


def save_prediction_ply(
    path,
    points: np.ndarray,
    pred: np.ndarray,
    labels: Optional[np.ndarray] = None,
) -> None:
    """Write a prediction cloud (and ground truth + error mask if given)."""
    fields = [np.asarray(points, np.float32), labels_to_colors(pred),
              np.asarray(pred, np.int32)]
    names = ["x", "y", "z", "red", "green", "blue", "pred"]
    if labels is not None:
        fields.append(np.asarray(labels, np.int32))
        names.append("gt")
        err = ((pred != labels) & (labels >= 0)).astype(np.uint8)
        fields.append(err)
        names.append("error")
    write_ply(path, fields, names)


def save_potentials_ply(path, points: np.ndarray, potentials: np.ndarray) -> None:
    """Voting-coverage debug cloud (tester.py:320-333)."""
    write_ply(
        path,
        [np.asarray(points, np.float32), np.asarray(potentials, np.float32)],
        ["x", "y", "z", "pots"],
    )


def save_2d_panel(path, image: np.ndarray, gt: np.ndarray, pred: np.ndarray) -> None:
    """Side-by-side (input | ground truth | prediction) PNG panel — the
    repo's equivalent of the reference's TensorBoard image summaries
    (mvpnet/train_2d.py:209-228 ``add_image`` panels).

    Args:
      image: (H, W, 3) float in [0, 1]; gt/pred: (H, W) int train ids.
    """
    from PIL import Image

    img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
    h, w = img.shape[:2]
    gt_rgb = labels_to_colors(np.asarray(gt).reshape(-1)).reshape(h, w, 3)
    pr_rgb = labels_to_colors(np.asarray(pred).reshape(-1)).reshape(h, w, 3)
    panel = np.concatenate([img, gt_rgb, pr_rgb], axis=1)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(panel).save(str(path))
