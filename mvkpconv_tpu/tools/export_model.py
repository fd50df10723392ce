"""Export a trained model as a self-contained serving artifact.

Freezes config + weights + the full inference step (on-device pyramid,
2D UNet + lifting for fusion models, KPConv trunk, softmax) into ONE
serialized StableHLO program (``jax.export``), loadable via
``mvkpconv_tpu.eval.export.ServingModel`` without model code or
checkpoints. The reference's deployment unit, by contrast, is the whole
source tree + a torch checkpoint (KPConv-PyTorch/test_models.py:34-120).

Examples:
  # export a trained run for the exporting host's platform
  python -m mvkpconv_tpu.tools.export_model \\
      --config run/parameters.txt --checkpoint run/checkpoints \\
      --artifact outputs/model.stablehlo --selftest

  # lower for TPU serving + CPU fallback
  python -m mvkpconv_tpu.tools.export_model --config run/parameters.txt \\
      --checkpoint run/checkpoints --platforms tpu,cpu \\
      --artifact outputs/model.stablehlo
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="parameters.txt to load")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir to restore params from (fresh "
                    "init if omitted — smoke-test mode)")
    ap.add_argument("--artifact", default="outputs/model.stablehlo")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (e.g. "
                    "'tpu,cpu'); default: the exporting host's platform")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="serving batch size baked into the artifact "
                    "(default: cfg.batch_num)")
    ap.add_argument("--allow-custom-calls", action="store_true",
                    help="exempt tpu_custom_call (Pallas kernels) from the "
                    "export stability check — needed for TPU exports of the "
                    "default config (neighbor_method='binmin'); the artifact "
                    "is then tied to the exporting jaxlib generation")
    ap.add_argument("--selftest", action="store_true",
                    help="reload the artifact and run one batch through it")
    ap.add_argument("--whole-scene", action="store_true",
                    help="export the FULL-CLOUD program (sphere sweep + "
                    "vote accumulation inside the artifact — the "
                    "reference's test_models.py workload) instead of the "
                    "per-sphere-batch unit")
    ap.add_argument("--max-points", type=int, default=262144,
                    help="whole-scene artifact: static subsampled-cloud "
                    "point budget")
    ap.add_argument("--num-centers", type=int, default=256,
                    help="whole-scene artifact: static sphere-center "
                    "budget (must be a multiple of batch_num; pad real "
                    "center lists with eval.export.pad_centers)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.eval.export import (
        ServingModel,
        batch_spec_for,
        export_inference,
        infer_kind,
        save_exported,
    )
    from mvkpconv_tpu.models import KPFCNN, MVKPConv
    from mvkpconv_tpu.ops.pyramid import build_pyramid
    from mvkpconv_tpu.training.checkpoint import Checkpointer
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init

    cfg = KPConfig.load(args.config)
    if args.batch_size:
        cfg = cfg.replace(batch_num=args.batch_size)
    kind = infer_kind(cfg)
    model = KPFCNN(cfg) if kind == "kpfcnn" else MVKPConv(cfg)
    spec = batch_spec_for(cfg, kind)

    # init needs concrete arrays: a valid random batch at the spec shapes
    rng = np.random.RandomState(args.seed)
    batch = {}
    for k, s in spec.items():
        if k == "mask":
            batch[k] = jnp.ones(s.shape, s.dtype)
        elif k == "poses":
            batch[k] = jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), s.shape[:2] + (1, 1))
            )
        elif k == "intrinsics":
            K = np.zeros(s.shape, np.float32)
            K[..., 0, 0] = K[..., 1, 1] = 0.6 * cfg.image_width
            K[..., 0, 2] = cfg.image_width / 2
            K[..., 1, 2] = cfg.image_height / 2
            K[..., 2, 2] = 1.0
            batch[k] = jnp.asarray(K)
        else:
            batch[k] = jnp.asarray(rng.rand(*s.shape).astype(np.float32))
    pyr0 = jax.jit(
        lambda p, m: build_pyramid(p, m, cfg.pyramid_spec())
    )(batch["points"], batch["mask"])
    if kind == "kpfcnn":
        variables = jit_init(model, batch["features"], pyr0)
    else:
        variables = jit_init(model, batch, pyr0)

    if args.checkpoint:
        from mvkpconv_tpu.training.optim import make_optimizer
        from mvkpconv_tpu.training.steps import create_train_state

        state = create_train_state(variables, make_optimizer(cfg))
        restored = Checkpointer(args.checkpoint).restore(jax.device_get(state))
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
        variables = {"params": restored.params,
                     "batch_stats": restored.batch_stats}

    platforms = args.platforms.split(",") if args.platforms else None
    allow = ("tpu_custom_call",) if args.allow_custom_calls else ()
    if args.whole_scene:
        from mvkpconv_tpu.eval.export import export_whole_scene, scene_spec_for

        data = export_whole_scene(
            model, cfg, kind, variables, args.max_points, args.num_centers,
            platforms=platforms, allow_custom_calls=allow,
        )
        spec = scene_spec_for(cfg, args.max_points, args.num_centers)
    else:
        data = export_inference(
            model, cfg, kind, variables, spec, platforms,
            allow_custom_calls=allow,
        )
    path = save_exported(data, args.artifact)
    print(f"exported {kind}{' whole-scene' if args.whole_scene else ''} "
          f"({len(data) / 1e6:.1f} MB) -> {path}")

    if args.selftest:
        served = ServingModel.load(path)
        if args.whole_scene:
            scene = {
                k: jnp.ones(s.shape, s.dtype) if k == "mask"
                else jnp.asarray(rng.rand(*s.shape).astype(np.float32))
                for k, s in spec.items()
            }
            out = served(scene)
            probs, votes = np.asarray(out["probs"]), np.asarray(out["votes"])
            print(f"selftest OK: platforms={served.platforms} probs shape="
                  f"{probs.shape} voted points={int((votes > 0).sum())}")
        else:
            probs = np.asarray(served(batch))
            print(f"selftest OK: platforms={served.platforms} "
                  f"probs shape={probs.shape} checksum={probs.sum():.4f}")


if __name__ == "__main__":
    main()
