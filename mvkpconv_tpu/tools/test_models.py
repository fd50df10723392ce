"""Voting test of a trained KPConv-family checkpoint.

Replaces KPConv-PyTorch/test_models.py and test_scannet_baseline_models.py:
loads ``parameters.txt`` + the latest checkpoint from a training output dir
(self-describing like the reference's Log_* dirs), then runs the voting
sphere sweep and prints the per-class IoU table.

Example:
  python -m mvkpconv_tpu.tools.test_models --run outputs/run --data synthetic:2 --votes 10
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes

    add_common_args(ap)
    ap.add_argument("--run", required=True, help="training output dir")
    ap.add_argument("--votes", type=float, default=30.0)
    ap.add_argument("--html", action="store_true",
                    help="also write standalone interactive HTML viewers "
                         "(pred/gt/error clouds) next to the PLYs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data import SphereDataset
    from mvkpconv_tpu.eval import VotingTester
    from mvkpconv_tpu.models import KPFCNN, MVKPConv
    from mvkpconv_tpu.ops.pyramid import build_pyramid
    from mvkpconv_tpu.data.spheres import device_batch
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
    with_views = cfg.fusion != "none"
    scenes = load_scenes(args.data, with_views, cfg.num_views,
                         (cfg.image_height, cfg.image_width), seed_offset=100)
    ds = SphereDataset(scenes, cfg, training=False, seed=args.seed)

    kind = "kpfcnn" if cfg.fusion == "none" else "mvkpconv"
    model = KPFCNN(cfg) if cfg.fusion == "none" else MVKPConv(cfg)
    b0 = device_batch(ds.sample_batch())
    pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, cfg.pyramid_spec()))(
        jnp.asarray(b0["points"]), jnp.asarray(b0["mask"])
    )
    if kind == "kpfcnn":
        variables = jit_init(model, jnp.asarray(b0["features"]), pyr0)
    else:
        variables = jit_init(model, {k: jnp.asarray(v) for k, v in b0.items()}, pyr0)
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    ck = Checkpointer(run / "checkpoints")
    restored = ck.restore(jax.device_get(state))
    if restored is None:
        raise SystemExit(f"no checkpoint found under {run}/checkpoints")
    state = jax.device_put(restored)
    print(f"restored step {int(np.asarray(state.step))} from {ck.latest_path()}")

    eval_step = make_eval_step(make_apply_fn(model, cfg, kind), cfg)

    def predict(batch):
        return np.asarray(
            eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        )

    tester = VotingTester(ds, predict, cfg.num_classes, num_votes=args.votes,
                          ignore_label=cfg.ignore_label)
    ev = tester.run(log_every=20)
    print(ev.table())
    # prediction + potentials PLYs, like the reference's test artifact dumps
    # (tester.py:320-365)
    from mvkpconv_tpu.data.meta import CLASS_NAMES

    tester.save_artifacts(run / "test_preds", html=args.html,
                          class_names=CLASS_NAMES)
    print(f"prediction/potentials plys written to {run / 'test_preds'}")
    full = tester.score_reprojected(scenes)
    print(f"\nfull-resolution mIoU {full.miou:.4f}  OA {full.overall_accuracy:.4f}")


if __name__ == "__main__":
    main()
