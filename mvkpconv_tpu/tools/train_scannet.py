"""Train KPConv-family segmentation: baseline or MV-KPConv fusion.

One CLI replaces the reference's four entry scripts
(KPConv-PyTorch/train_ScanNet_baseline.py, train_ScanNet_sphere.py,
..._middle_fusion.py, ..._late_fusion.py) — the variant is ``--fusion``.

Examples:
  python -m mvkpconv_tpu.tools.train_scannet --fusion none --data synthetic --steps 200
  python -m mvkpconv_tpu.tools.train_scannet --fusion early --views --data synthetic:6
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes, resolve_config

    add_common_args(ap)
    ap.add_argument("--fusion", default="none",
                    choices=["none", "early", "middle", "late"])
    ap.add_argument("--in-features-dim", type=int, default=None)
    ap.add_argument("--path-2d", default=None,
                    help="train_2d output dir whose UNet weights to load "
                         "(frozen) into the fusion model (reference "
                         "config.path_2D, architectures_sphere.py:226-237)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data import SphereDataset
    from mvkpconv_tpu.data.spheres import device_batch
    from mvkpconv_tpu.eval.voting import validation_sweep
    from mvkpconv_tpu.models import KPFCNN, MVKPConv
    from mvkpconv_tpu.ops.pyramid import build_pyramid
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

    fusion = args.fusion
    in_dim = args.in_features_dim or (66 if fusion != "none" else 5)
    base = KPConfig(
        fusion=fusion,
        in_features_dim=in_dim,
        num_points=(16384, 4096, 1024, 256, 64),
    )
    cfg = resolve_config(args, base)
    # CLI flags override the config file's fusion choice
    cfg = cfg.replace(fusion=fusion)
    if args.in_features_dim:
        cfg = cfg.replace(in_features_dim=args.in_features_dim)
    elif cfg.base_feature_dim not in (1, 2, 4, 5, 7):
        cfg = cfg.replace(in_features_dim=in_dim)
    cfg.validate()
    with_views = args.views or fusion != "none"

    scenes = load_scenes(args.data, with_views, cfg.num_views,
                         (cfg.image_height, cfg.image_width))
    val_spec = args.val_data or "synthetic:2"
    val_scenes = load_scenes(val_spec, with_views, cfg.num_views,
                             (cfg.image_height, cfg.image_width), seed_offset=100)

    # Multi-host DP is a config change, not a code change (SURVEY §5): each
    # process owns a scene slice + samples its slice of the global batch;
    # the Trainer assembles the globally-sharded array per step.
    local_b = cfg.batch_num
    if jax.process_count() > 1:
        from mvkpconv_tpu.parallel import local_batch_size, shard_scenes

        scenes = shard_scenes(scenes)
        val_scenes = shard_scenes(val_scenes)
        local_b = local_batch_size(cfg.batch_num)
    host_seed = args.seed + 1000 * jax.process_index()
    ds = SphereDataset(scenes, cfg, training=True, seed=host_seed)
    val_ds = SphereDataset(val_scenes, cfg, training=False, seed=host_seed + 1)

    kind = "kpfcnn" if fusion == "none" else "mvkpconv"
    model = (
        KPFCNN(cfg)
        if fusion == "none"
        else MVKPConv(cfg, freeze_2d=bool(args.path_2d))
    )
    b0 = device_batch(ds.sample_batch())
    pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, cfg.pyramid_spec()))(
        jnp.asarray(b0["points"]), jnp.asarray(b0["mask"])
    )
    if kind == "kpfcnn":
        variables = jit_init(model, jnp.asarray(b0["features"]), pyr0)
    else:
        variables = jit_init(model, {k: jnp.asarray(v) for k, v in b0.items()}, pyr0)
        if args.path_2d:
            from mvkpconv_tpu.training.transfer import load_2d_checkpoint_into

            variables = load_2d_checkpoint_into(variables, args.path_2d)
            print(f"loaded frozen 2D weights from {args.path_2d}")

    # freeze the 2D net only when it comes pretrained (reference behavior);
    # without a checkpoint it must train end-to-end to be useful
    frozen = ("net_2d",) if (fusion != "none" and args.path_2d) else ()
    tx = make_optimizer(cfg, frozen_prefixes=frozen)
    state = create_train_state(variables, tx)
    apply_fn = make_apply_fn(model, cfg, kind)
    # data-parallel mesh over every visible device (single- OR multi-
    # process); threading it into the step keeps the banded gather-
    # transpose shard-local at any scale
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        if jax.process_count() > 1 or cfg.batch_num % n_dev == 0:
            from mvkpconv_tpu.parallel import make_mesh

            mesh = make_mesh()  # spans jax.devices() across all processes
        else:
            print(
                f"batch_num={cfg.batch_num} does not divide the "
                f"{n_dev}-device mesh — training on one device; set "
                f"--batch-num to a multiple of {n_dev} for data parallelism"
            )
    step = make_train_step(apply_fn, tx, cfg, mesh=mesh)
    eval_step = make_eval_step(apply_fn, cfg)

    def eval_fn(st):
        return validation_sweep(
            val_ds,
            lambda batch: np.asarray(
                eval_step(st, {k: jnp.asarray(v) for k, v in batch.items()})
            ),
            cfg.num_classes,
            num_batches=max(cfg.validation_size // cfg.batch_num, 1),
            ignore_label=cfg.ignore_label,
            artifact_dir=Path(args.output) / "val_preds",
        )

    trainer = Trainer(step, state, args.output, cfg, mesh=mesh, eval_fn=eval_fn)
    trainer.maybe_resume()
    trainer.fit(
        (device_batch(b) for b in ds.batches(batch_size=local_b)),
        max_steps=args.steps,
    )


if __name__ == "__main__":
    main()
