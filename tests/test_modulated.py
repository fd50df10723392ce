"""Modulated deformable KPConv (config.modulated=True path)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.models import KPFCNN
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig


@pytest.mark.slow
def test_modulated_deformable_forward_and_params():
    cfg = KPConfig(
        architecture=("simple", "resnetb_deformable_strided", "resnetb_deformable",
                      "nearest_upsample", "unary"),
        num_points=(256, 64),
        conv_neighbors=(8, 8),
        pool_neighbors=(8,),
        first_features_dim=16,
        first_subsampling_dl=0.1,
        in_radius=1.0,
        in_features_dim=2,
        num_classes=6,
        modulated=True,
    )
    scenes = [synthetic.make_scene(seed=0, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    batch = device_batch(ds.sample_batch(2))
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr)
    # offset head must be sized (3+1)·K when modulated (blocks.py:188-192)
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(variables["params"])}
    bias_shapes = [v.shape for k, v in flat.items() if "offset_bias" in k]
    assert all(s == (cfg.num_kernel_points * 4,) for s in bias_shapes), bias_shapes
    logits = model.apply(variables, jnp.asarray(batch["features"]), pyr)
    assert logits.shape == (2, 256, 6)
    assert np.isfinite(np.asarray(logits)).all()

    # gradients flow into the modulation parameters
    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(batch["features"]), pyr,
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    gflat = {jax.tree_util.keystr(p): v for p, v in
             jax.tree_util.tree_leaves_with_path(g)}
    off_grads = [float(jnp.abs(v).max()) for k, v in gflat.items()
                 if "offset_conv" in k and "weights" in k]
    assert off_grads and max(off_grads) > 0
