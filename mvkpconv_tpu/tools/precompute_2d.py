"""Precompute whole-scene lifted 2D features into a pickle cache.

Replaces the reference's offline feature dump (mvpnet/models/mvpnet_3d.py
__main__, :346-406: ScanNet2D3DWhole + frozen UNet → per-scene
``scannet_2d3d_feature_{split}.pkl``), consumed by the precomputed-feature
fusion route (architectures_new.py / ScanNet_new.py — here:
``MVKPConv`` with ``feature_2d3d`` batches).

Example:
  python -m mvkpconv_tpu.tools.precompute_2d --run outputs/train2d \\
      --data synthetic:4 --out cache/features.pkl
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes, resolve_config

    add_common_args(ap)
    ap.add_argument("--run", required=True, help="train_2d output dir")
    ap.add_argument("--out", required=True, help="output pickle path")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.eval.precompute import attach_precomputed_features
    from mvkpconv_tpu.models import UNetResNet34
    from mvkpconv_tpu.training.checkpoint import Checkpointer
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init

    run = Path(args.run)
    cfg2d = KPConfig.load(run / "parameters.txt")
    cfg = resolve_config(args, cfg2d)
    scenes = load_scenes(args.data, True, max(cfg.num_views, 8),
                         (cfg.image_height, cfg.image_width))

    # restore the trained UNet (same flow as transfer.load_2d_checkpoint_into)
    import flax.serialization as ser

    model = UNetResNet34(cfg.num_classes)
    img0 = jnp.zeros((1, cfg.image_height, cfg.image_width, 3), jnp.float32)
    variables = jit_init(model, img0)
    ck = Checkpointer(run / "checkpoints")
    path = run / "checkpoints" / "model_best.msgpack"
    if not path.exists():
        path = ck.latest_path()
    if path is None:
        raise SystemExit(f"no 2D checkpoint under {run}/checkpoints")
    raw = ser.msgpack_restore(Path(path).read_bytes())
    unet_vars = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    print(f"restored 2D UNet from {path}")

    cached = attach_precomputed_features(scenes, cfg, unet_vars)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("wb") as f:
        pickle.dump(cached, f)
    print(
        f"wrote {len(cached)} scenes with feature_2d3d "
        f"({cached[0]['feature_2d3d'].shape[1]}-d) to {out}"
    )


if __name__ == "__main__":
    main()
