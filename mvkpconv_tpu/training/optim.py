"""Optimizer construction.

Replaces the reference's two optimizer setups with one optax chain:
  * KPConv side (utils/trainer.py:72-79): SGD + momentum 0.98, grad-value
    clip at 100 (trainer.py:191-193), per-epoch exponential LR decay
    0.1^(1/150) (lr_decays dict), deform params at 0.1× LR;
  * mvpnet side (common/solver/build.py): reflection on torch.optim +
    WarmupMultiStepLR — expressed here via optax schedules.

Freezing (common/nn/freezer.py regex freeze, used for the 2D net inside 3D
training) becomes an optax mask that zeroes updates for matching subtrees.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import optax


def lr_schedule(cfg) -> optax.Schedule:
    """Per-epoch staircase exponential decay (trainer.py:239-241)."""
    return optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.epoch_steps,
        decay_rate=cfg.lr_decay,
        staircase=True,
    )


def _path_label(path, frozen_prefixes, deform_keywords) -> str:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(k) for k in keys)
    if any(joined.startswith(p) or f"/{p}" in joined for p in frozen_prefixes):
        return "frozen"
    if any(d in joined for d in deform_keywords):
        return "deform"
    return "train"


def make_optimizer(
    cfg,
    frozen_prefixes: Sequence[str] = (),
    deform_lr_factor: float = None,
) -> optax.GradientTransformation:
    """SGD+momentum with value clipping, LR schedule, freezing and the
    reference's reduced LR on deformable-offset params (trainer.py:72-79,
    ``deform_lr_factor`` 0.1 by default; overridable per-config for the
    deformable hyperparameter sweep)."""
    if deform_lr_factor is None:
        deform_lr_factor = getattr(cfg, "deform_lr_factor", 0.1)
    sched = lr_schedule(cfg)

    def sgd(scale: float):
        lr = sched if scale == 1.0 else (lambda step: sched(step) * scale)
        return optax.chain(
            optax.clip(cfg.grad_clip_value),
            optax.sgd(lr, momentum=cfg.momentum),
        )

    transforms = {
        "train": sgd(1.0),
        "deform": sgd(deform_lr_factor),
        "frozen": optax.set_to_zero(),
    }

    def label_fn(params):
        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: _path_label(path, tuple(frozen_prefixes), ("offset_conv", "offset_bias")),
            params,
        )

    return optax.multi_transform(transforms, label_fn)
