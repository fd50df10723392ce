"""Deformable KPConv: forward, regularizer, training step."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.models import KPFCNN
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.losses import deform_regularization
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import create_train_state, make_apply_fn, make_train_step

DEFORM_ARCH = (
    "simple",
    "resnetb",
    "resnetb_deformable_strided",
    "resnetb_deformable",
    "nearest_upsample",
    "unary",
)


def deform_cfg():
    return KPConfig(
        architecture=DEFORM_ARCH,
        num_points=(256, 64),
        conv_neighbors=(10, 10),
        pool_neighbors=(10,),
        first_features_dim=16,
        first_subsampling_dl=0.1,
        in_radius=1.0,
        in_features_dim=2,
        num_classes=8,
        batch_num=2,
    )


def _batch(cfg):
    scenes = [synthetic.make_scene(seed=0, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=True, seed=0)
    return device_batch(ds.sample_batch())


@pytest.mark.slow
def test_deformable_forward_and_intermediates():
    cfg = deform_cfg()
    batch = _batch(cfg)
    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr)
    logits, state = model.apply(
        variables, jnp.asarray(batch["features"]), pyr, train=True,
        mutable=["batch_stats", "intermediates"],
    )
    assert logits.shape == (2, 256, 8)
    reg = deform_regularization(state["intermediates"])
    assert np.isfinite(float(reg)) and float(reg) >= 0
    # offset params exist
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("offset_conv" in jax.tree_util.keystr(p) for p, _ in flat)


def test_deformable_train_step_learns_offsets():
    cfg = deform_cfg()
    batch = _batch(cfg)
    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr)
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    step = make_train_step(make_apply_fn(model, cfg, "kpfcnn"), tx, cfg, donate=False)
    losses = []
    for _ in range(6):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
