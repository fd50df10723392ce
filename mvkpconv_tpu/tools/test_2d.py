"""Standalone evaluation of a trained 2D UNet-ResNet34 checkpoint.

Replaces mvpnet/test_2d.py:1-187: load ``parameters.txt`` + a checkpoint
from a train_2d output dir, sweep a full frame dataset once, print the
Evaluator per-class IoU/accuracy table — the reference's 2D-only accuracy
row, reproducible from a saved checkpoint (no training loop required).

Example:
  python -m mvkpconv_tpu.tools.test_2d --run outputs/run2d --data synthetic:2
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes

    add_common_args(ap)
    ap.add_argument("--run", required=True, help="train_2d output dir")
    ap.add_argument(
        "--best", action="store_true",
        help="score model_best.msgpack instead of the latest checkpoint",
    )
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from mvkpconv_tpu.data.chunks import Frames2DDataset
    from mvkpconv_tpu.eval import evaluate_frames
    from mvkpconv_tpu.models import UNetResNet34
    from mvkpconv_tpu.training.checkpoint import Checkpointer
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init
    from mvkpconv_tpu.training.optim import make_optimizer
    from mvkpconv_tpu.training.steps import (
        create_train_state,
        make_apply_fn,
        make_eval_step,
    )

    run = Path(args.run)
    cfg = KPConfig.load(run / "parameters.txt")
    scenes = load_scenes(
        args.data, True, cfg.num_views,
        (cfg.image_height, cfg.image_width), seed_offset=100,
    )
    ds = Frames2DDataset(scenes, training=False)
    if not len(ds):
        raise SystemExit("no frames in --data (need rendered views)")

    model = UNetResNet34(cfg.num_classes)
    b0 = ds.sample_batch(cfg.batch_num)
    variables = jit_init(model, jnp.asarray(b0["images"]))
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    ckpt = Checkpointer(run / "checkpoints")
    restored = ckpt.restore_best(state) if args.best else ckpt.restore(state)
    if restored is None:
        raise SystemExit(f"no {'best ' if args.best else ''}checkpoint in {run}")
    state = restored
    print(
        f"evaluating step-{int(np.asarray(state.step))} "
        f"{'best ' if args.best else ''}checkpoint over {len(ds)} frames"
    )

    eval_step = make_eval_step(make_apply_fn(model, cfg, "unet2d"), cfg)
    ev = evaluate_frames(
        lambda b: eval_step(state, {k: jnp.asarray(v) for k, v in b.items()}),
        ds,
        batch_size=cfg.batch_num,
        ignore_label=cfg.ignore_label,
    )
    print(ev.table())
    out = run / "test_2d_IoUs.txt"
    out.write_text(ev.table() + "\n")
    print(f"table written to {out}")
    return ev


if __name__ == "__main__":
    main()
