"""Dump deformable-kernel inspection artifacts (PLYs + stats).

Headless equivalent of the reference's mayavi deformed-kernel inspector
(KPConv-PyTorch/utils/visualizer.py ``ModelVisualizer.show_deformable_kernels``):
runs one forward pass of a deformable model on a batch, collects the sown
``deform_kp_locs``/``deform_min_d2`` intermediates, and writes per-layer PLYs
(query cloud ⊕ deformed kernel points, colored by kernel point, with the
normalized fitting distance as a scalar field) plus a ``deform_stats.json``
with offset magnitudes and in-extent fractions.

Examples:
  # fresh-initialized deformable baseline on synthetic data
  python -m mvkpconv_tpu.tools.inspect_deform --output outputs/deform

  # a trained checkpoint
  python -m mvkpconv_tpu.tools.inspect_deform --config run/parameters.txt \
      --checkpoint run/checkpoints --output outputs/deform
"""

from __future__ import annotations

import argparse
import json

import numpy as np


DEFORM_DEEPER = (
    "simple",
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
)


def main(argv=None):
    from mvkpconv_tpu.tools.common import add_common_args, load_scenes, resolve_config

    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir to restore params from")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.data import SphereDataset
    from mvkpconv_tpu.data.spheres import device_batch
    from mvkpconv_tpu.eval.deform_inspect import inspect_deformable
    from mvkpconv_tpu.models import KPFCNN
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.checkpoint import Checkpointer
    from mvkpconv_tpu.ops.pyramid import build_pyramid

    base = KPConfig(
        architecture=DEFORM_DEEPER,
        num_points=(4096, 1024, 256),
        conv_neighbors=(20, 20, 20),
        pool_neighbors=(20, 20),
        deform_conv_neighbors=(30, 30, 30),
        deform_pool_neighbors=(30, 30),
        in_features_dim=2,
        batch_num=2,
    )
    cfg = resolve_config(args, base)
    if not any("deform" in b for b in cfg.architecture):
        raise SystemExit("config has no deformable blocks — nothing to inspect")

    scenes = load_scenes(args.data, False, cfg.num_views,
                         (cfg.image_height, cfg.image_width))
    ds = SphereDataset(scenes, cfg, training=False, seed=args.seed)
    batch = device_batch(ds.sample_batch())

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]),
        cfg.pyramid_spec(),
    )
    variables = model.init(
        jax.random.PRNGKey(args.seed), jnp.asarray(batch["features"]), pyr
    )
    if args.checkpoint:
        from mvkpconv_tpu.training.optim import make_optimizer
        from mvkpconv_tpu.training.steps import create_train_state

        state = create_train_state(variables, make_optimizer(cfg))
        restored = Checkpointer(args.checkpoint).restore(jax.device_get(state))
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
        variables = {"params": restored.params,
                     "batch_stats": restored.batch_stats}

    summary = inspect_deformable(model, variables, batch, cfg, args.output)
    print(json.dumps(summary["layers"], indent=2))
    print(f"wrote {len(summary['plys'])} PLYs to {args.output}")


if __name__ == "__main__":
    main()
