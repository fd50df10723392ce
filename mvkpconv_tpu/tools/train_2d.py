"""Train the 2D UNet-ResNet34 semantic segmentation network.

Replaces mvpnet/train_2d.py (iteration-based 2D trainer). Produces the
frozen 2D checkpoint consumed by the fusion/MVPNet models.

Example:
  python -m mvkpconv_tpu.tools.train_2d --data synthetic:4 --steps 500
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes, resolve_config

    add_common_args(ap)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument(
        "--pretrained",
        default=None,
        metavar="RESNET34_PTH",
        help="torchvision ResNet34 state-dict file to initialize the encoder "
        "(the reference uses resnet34(pretrained=True), unet_resnet34.py:17)",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data.chunks import Frames2DDataset
    from mvkpconv_tpu.models import UNetResNet34
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init
    from mvkpconv_tpu.training.optim import make_optimizer
    from mvkpconv_tpu.training.steps import (
        create_train_state,
        make_apply_fn,
        make_eval_step,
        make_train_step,
    )
    from mvkpconv_tpu.training.trainer import Trainer

    cfg = resolve_config(
        args,
        KPConfig(learning_rate=args.lr, momentum=0.9, batch_num=8, epoch_steps=100),
    )
    scenes = load_scenes(args.data, True, cfg.num_views,
                         (cfg.image_height, cfg.image_width))
    val_scenes = load_scenes(args.val_data or "synthetic:2", True, cfg.num_views,
                             (cfg.image_height, cfg.image_width), seed_offset=100)
    ds = Frames2DDataset(scenes, training=True, seed=args.seed)
    val_ds = Frames2DDataset(val_scenes, training=False)

    model = UNetResNet34(cfg.num_classes)
    b0 = ds.sample_batch(cfg.batch_num)
    variables = jit_init(model, jnp.asarray(b0["images"]))
    if args.pretrained:
        from mvkpconv_tpu.models.unet2d import load_torch_resnet34_encoder

        variables = load_torch_resnet34_encoder(variables, args.pretrained)
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    apply_fn = make_apply_fn(model, cfg, "unet2d")
    step = make_train_step(apply_fn, tx, cfg)
    eval_step = make_eval_step(apply_fn, cfg)

    def eval_fn(st):
        from mvkpconv_tpu.eval import evaluate_frames
        from mvkpconv_tpu.utils.visualize import save_2d_panel

        panel_done = []

        def probs_fn(vb):
            probs = np.asarray(
                eval_step(st, {k: jnp.asarray(v) for k, v in vb.items()})
            )
            if not panel_done:
                # image | gt | prediction panel, like the reference's TB
                # image summaries (train_2d.py:209-228)
                panel_done.append(True)
                step = int(np.asarray(st.step))
                save_2d_panel(
                    f"{args.output}/panels/step{step:06d}.png",
                    vb["images"][0], vb["labels"][0], probs[0].argmax(-1),
                )
            return probs

        # FULL val-set sweep — the same code path tools/test_2d.py scores
        # a saved checkpoint with, so the metric that selects model_best
        # here is reproducible standalone (mvpnet/test_2d.py parity)
        ev = evaluate_frames(
            probs_fn, val_ds, batch_size=cfg.batch_num,
            ignore_label=cfg.ignore_label,
        )
        return {"miou": ev.miou, "class_iou": ev.class_iou}

    trainer = Trainer(step, state, args.output, cfg, eval_fn=eval_fn)
    trainer.maybe_resume()
    trainer.fit(
        ({k: jnp.asarray(v) for k, v in b.items()} for b in ds.batches(cfg.batch_num)),
        max_steps=args.steps,
    )


if __name__ == "__main__":
    main()
