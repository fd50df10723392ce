"""MV-KPConv inference on a custom COLMAP-reconstructed dataset.

Replaces KPConv-PyTorch/test_models_colmap.py and
test_colmap_baseline_models.py: assemble a scene from a laser scan +
COLMAP cameras/poses/dense depths, then run the voting sphere sweep with a
trained checkpoint and dump predictions as a colored PLY.

Example:
  python -m mvkpconv_tpu.tools.test_colmap --run outputs/fusion \
      --sparse ws/sparse/0 --depths ws/stereo/depth_maps \
      --laser scan.ply --images ws/images --alignment matrix_for_images.txt
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True, help="training output dir")
    ap.add_argument("--sparse", required=True, help="COLMAP sparse model dir")
    ap.add_argument("--depths", required=True, help="dense depth_maps dir")
    ap.add_argument("--laser", required=True, help="laser scan ply")
    ap.add_argument("--images", default=None, help="undistorted images dir")
    ap.add_argument("--alignment", default=None, help="matrix_for_images.txt")
    ap.add_argument("--votes", type=float, default=10.0)
    ap.add_argument("--output-ply", default=None, help="prediction ply path")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data import SphereDataset
    from mvkpconv_tpu.data.colmap_io import load_colmap_scene
    from mvkpconv_tpu.data.meta import SCANNET_COLOR_PALETTE
    from mvkpconv_tpu.data.spheres import device_batch
    from mvkpconv_tpu.eval import VotingTester
    from mvkpconv_tpu.models import KPFCNN, MVKPConv
    from mvkpconv_tpu.ops.pyramid import build_pyramid
    from mvkpconv_tpu.training.checkpoint import Checkpointer
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init
    from mvkpconv_tpu.training.optim import make_optimizer
    from mvkpconv_tpu.training.steps import (
        create_train_state,
        make_apply_fn,
        make_eval_step,
    )
    from mvkpconv_tpu.utils.ply import write_ply

    run = Path(args.run)
    cfg = KPConfig.load(run / "parameters.txt")
    scene = load_colmap_scene(
        args.sparse, args.depths, args.laser, args.alignment,
        resize_hw=(cfg.image_height, cfg.image_width), image_dir=args.images,
        max_frames=args.max_frames,
    )
    ds = SphereDataset([scene], cfg, training=False)

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
    state = create_train_state(variables, make_optimizer(cfg))
    restored = Checkpointer(run / "checkpoints").restore(jax.device_get(state))
    if restored is None:
        raise SystemExit(f"no checkpoint under {run}/checkpoints")
    state = jax.device_put(restored)

    eval_step = make_eval_step(make_apply_fn(model, cfg, kind), cfg)

    def predict(batch):
        return np.asarray(
            eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        )

    tester = VotingTester(ds, predict, cfg.num_classes, num_votes=args.votes,
                          ignore_label=cfg.ignore_label)
    tester.run(log_every=20)
    pred = tester.probs[0].argmax(-1).astype(np.int32)
    print(f"predicted {len(pred)} subsampled points "
          f"({np.bincount(pred, minlength=cfg.num_classes)})")
    if args.output_ply:
        palette = np.asarray(SCANNET_COLOR_PALETTE, np.uint8)
        colors = palette[np.clip(pred, 0, len(palette) - 1)]
        write_ply(args.output_ply, [ds.scenes[0]["points"], colors, pred],
                  ["x", "y", "z", "red", "green", "blue", "pred"])
        print(f"wrote {args.output_ply}")


if __name__ == "__main__":
    main()
