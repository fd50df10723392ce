"""Train MVPNet (multi-view 2D lifting + PointNet++) on point chunks.

Replaces mvpnet/train_mvpnet_3d.py. The 2D net is frozen by default
(FROZEN_PATTERNS net_2d in the reference's yaml configs).

Example:
  python -m mvkpconv_tpu.tools.train_mvpnet --data synthetic:4 --steps 300
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes, resolve_config

    add_common_args(ap)
    ap.add_argument("--num-points", type=int, default=8192)
    ap.add_argument("--num-views", type=int, default=3)
    ap.add_argument("--train-2d", action="store_true", help="unfreeze the 2D net")
    ap.add_argument(
        "--no-images", action="store_true",
        help="train the 3D-only PointNet++ baseline on point colors "
             "(reference configs/scannet/3d_baselines, mvpnet/data/scannet_3d.py)",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data.chunks import ChunkDataset
    from mvkpconv_tpu.models import MVPNet3D
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init
    from mvkpconv_tpu.training.metrics import confusion_matrix, iou_from_confusion
    from mvkpconv_tpu.training.optim import make_optimizer
    from mvkpconv_tpu.training.steps import (
        create_train_state,
        make_apply_fn,
        make_eval_step,
        make_train_step,
    )
    from mvkpconv_tpu.training.trainer import Trainer

    cfg = resolve_config(
        args, KPConfig(batch_num=4, num_views=args.num_views, epoch_steps=100)
    )
    with_views = not args.no_images
    scenes = load_scenes(args.data, with_views, cfg.num_views,
                         (cfg.image_height, cfg.image_width))
    val_scenes = load_scenes(args.val_data or "synthetic:2", with_views,
                             cfg.num_views, (cfg.image_height, cfg.image_width),
                             seed_offset=100)
    ds = ChunkDataset(scenes, num_points=args.num_points, num_views=cfg.num_views,
                      use_color_feature=args.no_images, training=True,
                      seed=args.seed)
    val_ds = ChunkDataset(val_scenes, num_points=args.num_points,
                          num_views=cfg.num_views,
                          use_color_feature=args.no_images, training=False, seed=1)

    def to_device(b):
        drop = ("point_indices", "scene_index")
        drop = drop if args.no_images else drop + ("colors",)
        return {k: jnp.asarray(v) for k, v in b.items() if k not in drop}

    if args.no_images:
        from mvkpconv_tpu.models import PN2SSG

        model = PN2SSG(cfg.num_classes)
        kind = "pn2"
        b0 = to_device(ds.sample_batch(cfg.batch_num))
        variables = jit_init(model, b0["points"], b0.get("features"))
        tx = make_optimizer(cfg)
    else:
        model = MVPNet3D(cfg.num_classes, freeze_2d=not args.train_2d)
        kind = "mvpnet"
        b0 = to_device(ds.sample_batch(cfg.batch_num))
        variables = jit_init(model, b0)
        tx = make_optimizer(cfg, frozen_prefixes=() if args.train_2d else ("net_2d",))
    state = create_train_state(variables, tx)
    apply_fn = make_apply_fn(model, cfg, kind)
    step = make_train_step(apply_fn, tx, cfg)
    eval_step = make_eval_step(apply_fn, cfg)

    def eval_fn(st):
        conf = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
        for _ in range(4):
            vb = val_ds.sample_batch(cfg.batch_num)
            probs = np.asarray(eval_step(st, to_device(vb)))
            conf += np.asarray(
                confusion_matrix(
                    jnp.argmax(jnp.asarray(probs), -1), jnp.asarray(vb["labels"]),
                    cfg.num_classes, ignore_label=cfg.ignore_label,
                )
            )
        iou = iou_from_confusion(conf)
        return {"miou": float(iou.mean())}

    trainer = Trainer(step, state, args.output, cfg, eval_fn=eval_fn)
    trainer.maybe_resume()
    trainer.fit((to_device(b) for b in ds.batches(cfg.batch_num)), max_steps=args.steps)


if __name__ == "__main__":
    main()
