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


def test_deformable_grads_finite_with_padded_query_rows():
    """Regression: a padded (all-shadow) query row's shadow neighbors sit at
    coordinate-difference (0,0,0), exactly on the CENTER kernel point, so the
    influence distance is exactly 0 — plain sqrt's VJP is inf there and
    ``0 cotangent × inf = NaN`` used to poison the offset gradients from the
    first step (the blocks._safe_sqrt guard; its clamp must also be a NORMAL
    float, because hardware FTZ flushes a denormal clamp back to 0)."""
    from mvkpconv_tpu.models.blocks import _safe_sqrt, kpconv_apply
    from mvkpconv_tpu.models.kernel_points import kernel_point_positions

    # sqrt guard in isolation: value matches, gradient finite at 0
    assert float(jax.grad(_safe_sqrt)(jnp.float32(0.0))) == 0.0
    assert float(jax.grad(_safe_sqrt)(jnp.float32(1e-38))) == 0.0  # denormal
    np.testing.assert_allclose(
        float(jax.grad(_safe_sqrt)(jnp.float32(0.09))), 0.5 / 0.3, rtol=1e-6
    )

    b, nq, ns, k, m = 1, 4, 8, 5, 15
    rng = np.random.RandomState(0)
    kpts = jnp.asarray(kernel_point_positions(1.0, m))
    q = np.full((b, nq, 3), 1e6, np.float32)
    q[0, :2] = rng.randn(2, 3) * 0.3  # rows 2,3 stay shadow queries
    s = np.full((b, ns, 3), 1e6, np.float32)
    s[0, :6] = rng.randn(6, 3) * 0.3
    inds = np.full((b, nq, k), ns, np.int32)  # shadow neighbors everywhere
    inds[0, :2] = rng.randint(0, 6, (2, k))  # real queries: real neighbors
    x = np.zeros((b, ns, 4), np.float32)
    x[0, :6] = rng.randn(6, 4)
    w = rng.randn(m, 4, 4).astype(np.float32) * 0.1

    def loss(offsets):
        out, (min_d2, kp_abs) = kpconv_apply(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(inds), jnp.asarray(x),
            kpts, jnp.asarray(w), 1.2,
            kp_offsets=offsets, return_deform_aux=True,
        )
        return jnp.sum(out) + jnp.sum(min_d2) + jnp.sum(kp_abs)

    g = jax.grad(loss)(jnp.zeros((b, nq, m, 3), jnp.float32))
    assert bool(jnp.all(jnp.isfinite(g))), "offset gradients must be finite"
    # real query rows still receive signal
    assert float(jnp.max(jnp.abs(g[0, :2]))) > 0


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
