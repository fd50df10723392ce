"""End-to-end train-step A/B of the gather-transpose modes on TPU.

Runs the production vag loop at bench shapes for each
KPConfig.gather_transpose mode. The scatter baseline measured 188.9
ms/step (346.9k pts/s); the no-scatter bound is 71.3 ms (919.6k) —
scratch/prof_scatter_share.py. Run: python scratch/prof_transpose_ab.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops.gather import set_gather_transpose
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.init import jit_init
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import create_train_state, make_apply_fn
from mvkpconv_tpu.training.losses import segmentation_cross_entropy
from __graft_entry__ import _make_batch

ITERS = int(os.environ.get("PT_ITERS", 8))
MODES = os.environ.get("MODES", "scatter,sorted,window").split(",")

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


ref_loss = None
for mode in MODES:
    set_gather_transpose(mode)
    loop = make_loop()
    val = float(loop(state0, batch))
    if ref_loss is None:
        ref_loss = val
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(state0, batch))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS
    drift = abs(val - ref_loss) / max(abs(ref_loss), 1e-9)
    print(
        f"{mode:8s} {dt*1e3:8.2f} ms/step   {pts/dt:10.0f} pts/s"
        f"   loop-val drift vs scatter: {drift:.2e}",
        flush=True,
    )
