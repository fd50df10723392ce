"""MVPNet whole-scene evaluation with sliding chunks.

Replaces mvpnet/test_mvpnet_3d.py:70-233: sliding-window chunks over each
scene, per-point logits accumulated onto the full cloud and averaged by
coverage, Evaluator class table.

Example:
  python -m mvkpconv_tpu.tools.test_mvpnet --run outputs/mvpnet --data synthetic:2
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes

    add_common_args(ap)
    ap.add_argument("--run", required=True)
    ap.add_argument("--num-points", type=int, default=8192)
    ap.add_argument("--num-views", type=int, default=3)
    ap.add_argument("--stride", type=float, default=0.5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data.chunks import ChunkDataset, SlidingChunks
    from mvkpconv_tpu.eval import Evaluator
    from mvkpconv_tpu.models import MVPNet3D
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
    scenes = load_scenes(args.data, True, args.num_views,
                         (cfg.image_height, cfg.image_width), seed_offset=100)
    ds = ChunkDataset(scenes, num_points=args.num_points, num_views=args.num_views,
                      training=False)
    sliding = SlidingChunks(ds, stride=args.stride)

    def to_device(b):
        return {k: jnp.asarray(v) for k, v in b.items()
                if k not in ("point_indices", "scene_index", "colors")}

    model = MVPNet3D(cfg.num_classes)
    b0 = to_device(ds.sample_batch(1))
    variables = jit_init(model, b0)
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    restored = Checkpointer(run / "checkpoints").restore(jax.device_get(state))
    if restored is None:
        raise SystemExit(f"no checkpoint under {run}/checkpoints")
    state = jax.device_put(restored)

    eval_step = make_eval_step(make_apply_fn(model, cfg, "mvpnet"), cfg)
    ev = Evaluator(ignore_label=cfg.ignore_label)
    for si, scene in enumerate(scenes):
        logits_sum = np.zeros((len(scene["points"]), cfg.num_classes), np.float32)
        coverage = np.zeros(len(scene["points"]), np.float32)
        for chunk in sliding.scene_chunks(si):
            batch = {k: v[None] if np.ndim(v) > 0 else np.asarray([v])
                     for k, v in chunk.items() if k != "point_indices"}
            probs = np.asarray(eval_step(state, to_device(batch)))[0]
            np.add.at(logits_sum, chunk["point_indices"], probs)
            np.add.at(coverage, chunk["point_indices"], 1.0)
        seen = coverage > 0
        pred = logits_sum.argmax(-1)
        ev.update(pred[seen], scene["labels"][seen])
        print(f"scene {si}: coverage {seen.mean():.2%}")
    print(ev.table())


if __name__ == "__main__":
    main()
