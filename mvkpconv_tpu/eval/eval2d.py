"""Full-dataset 2D segmentation evaluation.

Replaces mvpnet/test_2d.py:1-187 (standalone 2D UNet checkpoint scoring:
sweep a frame dataset once, accumulate the confusion, print the Evaluator
class table). The same sweep is the in-training validation metric of
tools/train_2d.py, so the number that selects ``model_best`` there and the
number this reports for a saved checkpoint are one code path.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from mvkpconv_tpu.data.meta import CLASS_NAMES
from mvkpconv_tpu.eval.evaluator import Evaluator


def evaluate_frames(
    probs_fn: Callable,
    dataset,
    batch_size: int = 8,
    ignore_label: int = -1,
    class_names: Optional[Sequence[str]] = None,
    max_batches: Optional[int] = None,
) -> Evaluator:
    """Score ``probs_fn`` over every frame of a Frames2DDataset.

    Args:
      probs_fn: batch dict -> (B, H, W, num_classes) class probabilities
        (or logits — only the argmax is used).
      dataset: Frames2DDataset (or anything with ``iter_batches``).
      max_batches: optional cap (smoke tests); None sweeps the full set.

    Returns the populated Evaluator (confusion over real frames only —
    the wrapped rows padding the final batch are excluded).
    """
    ev = Evaluator(
        class_names if class_names is not None else CLASS_NAMES,
        ignore_label=ignore_label,
    )
    for bi, (batch, count) in enumerate(dataset.iter_batches(batch_size)):
        if max_batches is not None and bi >= max_batches:
            break
        probs = np.asarray(probs_fn(batch))
        pred = probs.argmax(-1)
        ev.update(pred[:count], batch["labels"][:count])
    return ev
