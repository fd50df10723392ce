"""Training-step coverage for all three fusion variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import (
    create_train_state,
    make_apply_fn,
    make_eval_step,
    make_train_step,
)

ARCH = ("simple", "resnetb_strided", "resnetb", "nearest_upsample", "unary")



import pytest as _pytest

pytestmark = _pytest.mark.slow

def fusion_cfg(fusion):
    return KPConfig(
        architecture=ARCH,
        num_points=(256, 64),
        conv_neighbors=(8, 8),
        pool_neighbors=(8,),
        first_features_dim=16,
        first_subsampling_dl=0.1,
        in_radius=1.0,
        in_features_dim=66,
        fusion=fusion,
        num_views=2,
        image_height=24,
        image_width=32,
        batch_num=2,
        num_classes=8,
    )


@pytest.fixture(scope="module")
def scene():
    s = synthetic.make_scene(seed=5, num_points=12000)
    s.update(synthetic.render_views(s, 5, 24, 32, seed=5))
    return s


@pytest.mark.parametrize("fusion", ["early", "middle", "late"])
def test_fusion_train_step_decreases_loss(scene, fusion):
    cfg = fusion_cfg(fusion)
    ds = SphereDataset([scene], cfg, training=True, seed=0)
    batch = device_batch(ds.sample_batch())
    model = MVKPConv(cfg, freeze_2d=False)
    pyr0 = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}, pyr0
    )
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    step = make_train_step(make_apply_fn(model, cfg, "mvkpconv"), tx, cfg, donate=False)
    losses = []
    for _ in range(8):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_fusion_voting_eval(scene):
    from mvkpconv_tpu.eval import VotingTester

    cfg = fusion_cfg("early")
    ds = SphereDataset([scene], cfg, training=False, seed=0)
    model = MVKPConv(cfg)
    batch = device_batch(ds.sample_batch())
    pyr0 = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}, pyr0
    )
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    ev_step = make_eval_step(make_apply_fn(model, cfg, "mvkpconv"), cfg)

    def predict(b):
        return np.asarray(ev_step(state, {k: jnp.asarray(v) for k, v in b.items()}))

    tester = VotingTester(ds, predict, cfg.num_classes, num_votes=0.5)
    ev = tester.run(max_batches=30)
    # untrained model: just verify coverage + proper probability accumulation
    assert (tester.probs[0].sum(-1) > 0).mean() > 0.5
    assert ev.confusion.sum() > 0
