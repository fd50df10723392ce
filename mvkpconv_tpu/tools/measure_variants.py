"""Hermetic accuracy measurement of every trainable system.

Mirrors the reference's results table (README.md:156-161: MV-KPConv 74.40 /
MVPNet 71.21 / KPConv baseline 52.58 on its ScanNet subset) on the synthetic
RGB-D scenes — one row per system, identical data/budget/steps, voting eval
on held-out scenes. Used to produce the RESULTS.md accuracy table.

Default protocol is the reference's own TWO-STAGE recipe: the 2D UNet is
pretrained once on the training scenes' frames, then loaded FROZEN into
every fusion variant and into MVPNet (architectures_sphere.py:226-237
``config.path_2D`` + freeze; mvpnet FROZEN_PATTERNS net_2d) — the setup
under which the reference reports its fusion wins. ``--joint-2d`` restores
the round-2 from-scratch joint-training variant for comparison.

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
    ap.add_argument("--joint-2d", action="store_true",
                    help="train the 2D net jointly from scratch inside each "
                    "fusion variant instead of the reference's two-stage "
                    "protocol (pretrain once → frozen)")
    ap.add_argument("--steps-2d", type=int, default=600,
                    help="2D UNet pretraining steps for the two-stage path")
    ap.add_argument("--path-2d", default=None,
                    help="existing train_2d run dir to reuse instead of "
                    "pretraining the 2D net here")
    ap.add_argument("--override", action="append", default=[],
                    help="KPConfig field override key=value applied to every "
                    "variant (repeatable) — e.g. --override "
                    "deform_lr_factor=1.0 for the deformable sweep")
    ap.add_argument("--family", default="boxes",
                    choices=("boxes", "curved"),
                    help="synthetic scene family; 'curved' (cylinders / "
                    "shells / arches) is the regime the reference claims "
                    "deformable kernels win in")
    ap.add_argument("--tiny", action="store_true",
                    help="minuscule shapes for CI smoke runs (CPU-friendly); "
                    "accuracy numbers are meaningless at this size")
    ap.add_argument("--rerun", action="store_true",
                    help="re-measure variants already present in "
                    "<out>/results.json (default: skip them, so an "
                    "outage-interrupted matrix resumes where it stopped)")
    ap.add_argument("--save-checkpoints", action="store_true",
                    help="write <out>/<variant>/parameters.txt + a "
                    "checkpoints/ dir per variant so downstream tools "
                    "(tools/inspect_deform on the deformable sweep) can "
                    "restore the trained model")
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
    if args.tiny:
        h, w, views, scene_pts, frames = 24, 32, 2, 12_000, 4
    else:
        h, w, views, scene_pts, frames = 120, 160, 5, 120_000, 10

    def make_scenes(n, seed0, with_views=True):
        scenes = []
        for i in range(n):
            s = synthetic.make_scene(
                seed=seed0 + i, num_points=scene_pts, family=args.family
            )
            if with_views:
                s.update(
                    synthetic.render_views(s, frames, h, w, seed=seed0 + i)
                )
            scenes.append(s)
        return scenes

    base_kw = dict(
        num_points=(512, 128, 32, 16, 8) if args.tiny
        else (8192, 2048, 512, 128, 64),
        conv_neighbors=(10,) * 5 if args.tiny else (30,) * 5,
        pool_neighbors=(10,) * 4 if args.tiny else (30,) * 4,
        first_subsampling_dl=0.1 if args.tiny else 0.05,
        in_radius=1.2,
        batch_num=2 if args.tiny else 4,
        num_views=views,
        image_height=h,
        image_width=w,
        compute_dtype=jnp.float32 if args.tiny else jnp.bfloat16,
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
        # order-preserving: rows run in the order given, so long budgets
        # can put the highest-value comparisons first
        keep = [k.strip() for k in args.only.split(",")]
        unknown = [k for k in keep if k not in variants]
        if unknown:
            raise SystemExit(f"unknown variants {unknown}; "
                             f"choose from {list(variants)}")
        variants = {k: variants[k] for k in keep}

    # ---- stage 1 (reference protocol): pretrain the 2D UNet once on the
    # SAME training scenes, then freeze it inside every fusion variant
    # (architectures_sphere.py:226-237 loads config.path_2D and freezes —
    # the setup under which the reference reports its fusion wins).
    fusion_needed = (
        any(v.get("fusion", "none") != "none" for v in variants.values())
        or "mvpnet" in variants  # its fusion field is 'none' but the 2D
        # net is integral (lifted 2D features are its whole input)
    )
    two_stage = fusion_needed and not args.joint_2d

    def pretrain_2d():
        """Train the UNet on the training scenes' frames; returns its
        {'params', 'batch_stats'} (the net_2d subtree of fusion models)."""
        from mvkpconv_tpu.data.chunks import Frames2DDataset
        from mvkpconv_tpu.models import UNetResNet34

        cfg2 = KPConfig(**{**base_kw, "in_features_dim": 2,
                           "batch_num": 8, "learning_rate": 5e-3})
        scenes = make_scenes(args.train_scenes, 0, with_views=True)
        ds2 = Frames2DDataset(scenes, training=True, seed=0)
        model2 = UNetResNet34(cfg2.num_classes)
        b0 = ds2.sample_batch(cfg2.batch_num)
        variables = jit_init(model2, jnp.asarray(b0["images"]))
        tx2 = make_optimizer(cfg2)
        st = create_train_state(variables, tx2)
        step2 = make_train_step(make_apply_fn(model2, cfg2, "unet2d"), tx2, cfg2)
        from mvkpconv_tpu.data.prefetch import prefetch

        it = prefetch(
            ({k: jnp.asarray(v) for k, v in ds2.sample_batch(cfg2.batch_num).items()}
             for _ in iter(int, 1)),
            depth=2,
        )
        for i in range(args.steps_2d):
            st, stats = step2(st, next(it))
            if i % 100 == 0 or i == args.steps_2d - 1:
                print(f"  2d step {i}: loss "
                      f"{float(np.asarray(stats['loss'])):.3f}", flush=True)
        it.close()
        st = jax.device_get(st)
        return {"params": st.params, "batch_stats": st.batch_stats}

    vars_2d = None
    if two_stage and not args.path_2d:
        # resume-friendly: a crashed/relay-killed run leaves the pretrained
        # 2D net on disk in train_2d layout, reusable via --path-2d
        saved_2d = out_dir / "net_2d" / "checkpoints" / "model_best.msgpack"
        if saved_2d.exists():
            print(f"=== 2D net: reusing {saved_2d} ===", flush=True)
            args.path_2d = str(out_dir / "net_2d")
        else:
            print(f"=== 2D pretrain ({args.steps_2d} steps) ===", flush=True)
            t0 = time.time()
            vars_2d = pretrain_2d()
            import flax.serialization as ser

            saved_2d.parent.mkdir(parents=True, exist_ok=True)
            saved_2d.write_bytes(ser.msgpack_serialize(
                jax.device_get({"params": vars_2d["params"],
                                "batch_stats": vars_2d["batch_stats"]})
            ))
            print(f"  -> 2D net ready ({(time.time()-t0)/60:.1f} min), "
                  f"saved to {saved_2d}", flush=True)
    elif two_stage:
        print(f"=== 2D net: reusing {args.path_2d} ===", flush=True)

    # resume: a crashed/relay-killed matrix leaves its partial results.json;
    # finished rows are kept and skipped so the rerun only pays for the rest
    results_path = out_dir / "results.json"
    results = {}
    if results_path.exists() and not args.rerun:
        results = json.loads(results_path.read_text())
    for name, overrides in variants.items():
        if name in results and not args.rerun:
            print(f"=== {name}: already in {results_path}, skipping "
                  f"(--rerun to force) ===", flush=True)
            continue
        t_start = time.time()
        print(f"=== {name} ===", flush=True)
        cfg = KPConfig(**base_kw, **overrides)
        if args.override:
            import ast

            for ov in args.override:
                k, v = ov.split("=", 1)
                try:
                    v = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    pass  # keep as string
                cfg = cfg.replace(**{k: v})
        with_views = cfg.fusion != "none" or name == "mvpnet"
        train_scenes = make_scenes(args.train_scenes, 0, with_views)
        val_scenes = make_scenes(args.val_scenes, 100, with_views)

        if name == "mvpnet":
            ds = ChunkDataset(train_scenes, num_points=8192, num_views=views,
                              training=True, seed=0)
            val_ds = ChunkDataset(val_scenes, num_points=8192,
                                  num_views=views, training=False, seed=1)
            model = MVPNet3D(cfg.num_classes, freeze_2d=two_stage)
            kind = "mvpnet"

            def to_device(b):
                return {k: jnp.asarray(v) for k, v in b.items()
                        if k not in ("point_indices", "scene_index", "colors")}

            b0 = to_device(ds.sample_batch(cfg.batch_num))
            variables = jit_init(model, b0)
            if two_stage:
                # MVPNet's reference config freezes a pretrained 2D net too
                # (FROZEN_PATTERNS net_2d, mvpnet_3d yaml); like the fusion
                # branch, the net comes either from this run's pretraining
                # (vars_2d) or from a reused on-disk checkpoint (path_2d —
                # the crash/relay resume path, which previously fell back
                # to joint 2D training for this row only)
                if args.path_2d:
                    from mvkpconv_tpu.training.transfer import (
                        load_2d_checkpoint_into,
                    )

                    variables = load_2d_checkpoint_into(variables, args.path_2d)
                elif vars_2d is not None:
                    variables = dict(
                        variables,
                        params={**variables["params"], "net_2d": vars_2d["params"]},
                        batch_stats={**variables.get("batch_stats", {}),
                                     "net_2d": vars_2d["batch_stats"]},
                    )
        else:
            ds = SphereDataset(train_scenes, cfg, training=True, seed=0)
            val_ds = SphereDataset(val_scenes, cfg, training=False, seed=1)
            frozen_2d = cfg.fusion != "none" and two_stage
            model = (KPFCNN(cfg) if cfg.fusion == "none"
                     else MVKPConv(cfg, freeze_2d=frozen_2d))
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
                if frozen_2d:
                    # inject the pretrained 2D net (stage 2 of the
                    # reference's protocol) and freeze it below
                    if args.path_2d:
                        from mvkpconv_tpu.training.transfer import (
                            load_2d_checkpoint_into,
                        )

                        variables = load_2d_checkpoint_into(
                            variables, args.path_2d
                        )
                    else:
                        variables = dict(
                            variables,
                            params={**variables["params"],
                                    "net_2d": vars_2d["params"]},
                            batch_stats={**variables.get("batch_stats", {}),
                                         "net_2d": vars_2d["batch_stats"]},
                        )

        frozen = (
            ("net_2d",)
            if (kind in ("mvkpconv", "mvpnet") and two_stage)
            else ()
        )
        tx = make_optimizer(cfg, frozen_prefixes=frozen)
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

        if args.save_checkpoints:
            # restorable by tools/inspect_deform (same TrainState pytree:
            # the optimizer here matches make_optimizer(cfg) whenever
            # nothing is frozen — i.e. every 3D-only/deformable variant)
            from mvkpconv_tpu.training.checkpoint import Checkpointer

            vdir = out_dir / name
            vdir.mkdir(parents=True, exist_ok=True)
            cfg.save(vdir / "parameters.txt")
            Checkpointer(vdir / "checkpoints").save(
                jax.device_get(state), step=args.steps
            )
            print(f"  saved checkpoint -> {vdir}/checkpoints", flush=True)

        def predict(b):
            return np.asarray(eval_step(state, to_device(b)))

        if name == "mvpnet":
            # chunk-based eval: accumulate confusion over sampled val chunks
            from mvkpconv_tpu.training.metrics import (
                confusion_matrix, iou_from_confusion,
            )

            conf = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
            for _ in range(3 if args.tiny else 30):
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
                num_votes=1.0 if args.tiny else 10.0,
                ignore_label=cfg.ignore_label,
            )
            ev = tester.run(max_batches=4 if args.tiny else 200)
            miou = float(ev.miou)
            oa = float(ev.overall_accuracy)

        results[name] = {
            "miou": round(miou, 4),
            "oa": round(oa, 4),
            "final_loss": round(losses[-1], 4),
            "steps": args.steps,
            "minutes": round((time.time() - t_start) / 60, 1),
            "protocol": (
                "two_stage_frozen_2d" if frozen else
                ("joint_2d" if kind in ("mvkpconv", "mvpnet") else "3d_only")
            ),
        }
        print(f"  -> {results[name]}", flush=True)
        (out_dir / "results.json").write_text(json.dumps(results, indent=2))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
