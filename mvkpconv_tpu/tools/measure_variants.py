"""Hermetic accuracy measurement of every trainable system.

Mirrors the reference's results table (README.md:156-161: MV-KPConv 74.40 /
MVPNet 71.21 / KPConv baseline 52.58 on its ScanNet subset) on the synthetic
RGB-D scenes — one row per system, identical data/budget/steps, voting eval
on held-out scenes. Used to produce the RESULTS.md accuracy table.

Example:
  python -m mvkpconv_tpu.tools.measure_variants --steps 400 \\
      --out outputs/variants
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


ARCH_DEFORM = (
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "resnetb_strided",
    "resnetb_deformable",
    "resnetb_deformable",
    "resnetb_deformable_strided",
    "resnetb_deformable",
    "resnetb_deformable",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="outputs/variants")
    ap.add_argument("--train-scenes", type=int, default=6)
    ap.add_argument("--val-scenes", type=int, default=2)
    ap.add_argument("--only", default=None, help="comma-separated subset")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data import SphereDataset, synthetic
    from mvkpconv_tpu.data.chunks import ChunkDataset
    from mvkpconv_tpu.data.spheres import device_batch
    from mvkpconv_tpu.eval import VotingTester
    from mvkpconv_tpu.models import KPFCNN, MVKPConv, MVPNet3D
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

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    h, w, views = 120, 160, 5

    def make_scenes(n, seed0, with_views=True):
        scenes = []
        for i in range(n):
            s = synthetic.make_scene(seed=seed0 + i, num_points=120_000)
            if with_views:
                s.update(synthetic.render_views(s, 10, h, w, seed=seed0 + i))
            scenes.append(s)
        return scenes

    base_kw = dict(
        num_points=(8192, 2048, 512, 128, 64),
        conv_neighbors=(30,) * 5,
        pool_neighbors=(30,) * 4,
        first_subsampling_dl=0.05,
        in_radius=1.2,
        batch_num=4,
        num_views=views,
        image_height=h,
        image_width=w,
        compute_dtype=jnp.bfloat16,
    )

    variants = {
        "kpconv_baseline": dict(fusion="none", in_features_dim=2),
        "kpconv_deformable": dict(
            fusion="none", in_features_dim=2, architecture=ARCH_DEFORM,
            deform_conv_neighbors=(40,) * 5, deform_pool_neighbors=(40,) * 4,
        ),
        "kpconv_modulated": dict(
            fusion="none", in_features_dim=2, architecture=ARCH_DEFORM,
            deform_conv_neighbors=(40,) * 5, deform_pool_neighbors=(40,) * 4,
            modulated=True,
        ),
        "mvkpconv_early": dict(fusion="early", in_features_dim=66),
        "mvkpconv_middle": dict(fusion="middle", in_features_dim=66),
        "mvkpconv_late": dict(fusion="late", in_features_dim=66),
        "mvpnet": dict(fusion="none", in_features_dim=2),  # own path below
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}
    for name, overrides in variants.items():
        t_start = time.time()
        print(f"=== {name} ===", flush=True)
        cfg = KPConfig(**base_kw, **overrides)
        with_views = cfg.fusion != "none" or name == "mvpnet"
        train_scenes = make_scenes(args.train_scenes, 0, with_views)
        val_scenes = make_scenes(args.val_scenes, 100, with_views)

        if name == "mvpnet":
            ds = ChunkDataset(train_scenes, num_points=8192, num_views=views,
                              training=True, seed=0)
            val_ds = ChunkDataset(val_scenes, num_points=8192,
                                  num_views=views, training=False, seed=1)
            model = MVPNet3D(cfg.num_classes, freeze_2d=False)
            kind = "mvpnet"

            def to_device(b):
                return {k: jnp.asarray(v) for k, v in b.items()
                        if k not in ("point_indices", "scene_index", "colors")}

            b0 = to_device(ds.sample_batch(cfg.batch_num))
            variables = jit_init(model, b0)
        else:
            ds = SphereDataset(train_scenes, cfg, training=True, seed=0)
            val_ds = SphereDataset(val_scenes, cfg, training=False, seed=1)
            model = (KPFCNN(cfg) if cfg.fusion == "none"
                     else MVKPConv(cfg, freeze_2d=False))
            kind = "kpfcnn" if cfg.fusion == "none" else "mvkpconv"

            def to_device(b):
                return {k: jnp.asarray(v) for k, v in device_batch(b).items()}

            b0 = to_device(ds.sample_batch())
            pyr0 = jax.jit(
                lambda p, m: build_pyramid(p, m, cfg.pyramid_spec())
            )(b0["points"], b0["mask"])
            if kind == "kpfcnn":
                variables = jit_init(model, b0["features"], pyr0)
            else:
                variables = jit_init(model, b0, pyr0)

        tx = make_optimizer(cfg)
        state = create_train_state(variables, tx)
        apply_fn = make_apply_fn(model, cfg, kind)
        step = make_train_step(apply_fn, tx, cfg)
        eval_step = make_eval_step(apply_fn, cfg)

        from mvkpconv_tpu.data.prefetch import prefetch

        losses = []
        batches = prefetch(
            (to_device(ds.sample_batch(cfg.batch_num)) for _ in iter(int, 1)),
            depth=2,
        )
        for i in range(args.steps):
            state, stats = step(state, next(batches))
            if i % 100 == 0 or i == args.steps - 1:
                losses.append(float(np.asarray(stats["loss"])))
                print(f"  step {i}: loss {losses[-1]:.3f}", flush=True)
        batches.close()

        def predict(b):
            return np.asarray(eval_step(state, to_device(b)))

        if name == "mvpnet":
            # chunk-based eval: accumulate confusion over sampled val chunks
            from mvkpconv_tpu.training.metrics import (
                confusion_matrix, iou_from_confusion,
            )

            conf = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
            for _ in range(30):
                vb = val_ds.sample_batch(cfg.batch_num)
                probs = predict(vb)
                conf += np.asarray(confusion_matrix(
                    jnp.argmax(jnp.asarray(probs), -1),
                    jnp.asarray(vb["labels"]),
                    cfg.num_classes, ignore_label=cfg.ignore_label,
                ))
            iou = np.asarray(iou_from_confusion(conf))
            miou = float(iou.mean())
            oa = float(np.trace(conf) / max(conf.sum(), 1))
        else:
            tester = VotingTester(
                val_ds, lambda b: predict(b), cfg.num_classes,
                num_votes=10.0, ignore_label=cfg.ignore_label,
            )
            ev = tester.run(max_batches=200)
            miou = float(ev.miou)
            oa = float(ev.overall_accuracy)

        results[name] = {
            "miou": round(miou, 4),
            "oa": round(oa, 4),
            "final_loss": round(losses[-1], 4),
            "steps": args.steps,
            "minutes": round((time.time() - t_start) / 60, 1),
        }
        print(f"  -> {results[name]}", flush=True)
        (out_dir / "results.json").write_text(json.dumps(results, indent=2))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
