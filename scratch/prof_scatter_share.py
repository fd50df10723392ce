"""Attribute the train-step backward to the gather-transpose scatters.

Times the production vag loop twice: stock, and with every conv-block
feature gather wrapped in stop_gradient (d_x = 0 through the gather, so
XLA emits NO scatter-adds for the trunk). The delta is the end-to-end
cost of the backward scatters (plus anything fused to them). Gradients
in the patched run are WRONG — this is a cost-attribution probe only.

Run: python scratch/prof_scatter_share.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.init import jit_init
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import (
    create_train_state, make_apply_fn,
)
from mvkpconv_tpu.training.losses import segmentation_cross_entropy
from __graft_entry__ import _make_batch
import mvkpconv_tpu.models.blocks as blocks_mod

ITERS = int(os.environ.get("PT_ITERS", 8))

cfg = KPConfig(
    fusion="early", in_features_dim=66,
    num_points=(16384, 4096, 1024, 256, 64),
    conv_neighbors=(30, 30, 30, 30, 30),
    pool_neighbors=(30, 30, 30, 30),
    num_views=5, image_height=120, image_width=160,
    batch_num=4, compute_dtype=jnp.bfloat16,
)
b = cfg.batch_num
model = MVKPConv(cfg)
spec = cfg.pyramid_spec()
rng = np.random.RandomState(0)
batch = {k: jnp.asarray(v) for k, v in _make_batch(cfg, b, rng).items()}
pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, spec))(batch["points"], batch["mask"])
variables = jit_init(model, batch, pyr0)
pts = b * cfg.num_points[0]

tx = make_optimizer(cfg, frozen_prefixes=("net_2d",))
apply_fn = make_apply_fn(model, cfg, "mvkpconv")
state0 = create_train_state(variables, tx)


def loss_of(params, batch_stats, batch, step):
    rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(0), step)}
    (logits, updates) = apply_fn(
        {"params": params, "batch_stats": batch_stats},
        batch, True, ["batch_stats"], rngs=rngs,
    )
    return segmentation_cross_entropy(
        logits, batch["labels"], batch.get("mask"),
        ignore_label=cfg.ignore_label,
    )


def make_loop():
    @jax.jit
    def loop_vag(state, batch):
        def body(i, carry):
            acc, params = carry
            bt = dict(batch)
            bt["points"] = batch["points"] + acc * 1e-20
            loss, grads = jax.value_and_grad(loss_of)(
                params, state.batch_stats, bt, i
            )
            params = jax.tree.map(
                lambda p, g: p - 1e-20 * g.astype(p.dtype), params, grads
            )
            return acc + loss, params
        acc, params = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((), jnp.float32), state.params)
        )
        return acc + sum(
            jnp.sum(x).astype(jnp.float32) * 1e-20
            for x in jax.tree.leaves(params)
        )
    return loop_vag


def timeit(name, loop):
    float(loop(state0, batch))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(state0, batch))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS
    print(f"{name:14s} {dt*1e3:8.2f} ms/step   {pts/dt:10.0f} pts/s", flush=True)
    return dt


t_stock = timeit("vag stock", make_loop())

_orig = blocks_mod.group_points
def _nograd_gather(features, index):
    return _orig(jax.lax.stop_gradient(features), index)
blocks_mod.group_points = _nograd_gather
try:
    t_nog = timeit("vag nograd-gth", make_loop())
finally:
    blocks_mod.group_points = _orig

print(f"scatter(+fused) share: {(t_stock - t_nog)*1e3:.2f} ms", flush=True)
