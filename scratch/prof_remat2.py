"""Train-step time: remat 'none' vs 'blocks' at bench config (VERDICT #2)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.init import jit_init
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import (
    create_train_state, make_apply_fn, make_train_step,
)
from __graft_entry__ import _make_batch

iters = 16
rng = np.random.RandomState(0)

for remat in ("none", "blocks"):
    cfg = KPConfig(
        fusion="early", in_features_dim=66,
        num_points=(16384, 4096, 1024, 256, 64),
        conv_neighbors=(30,) * 5, pool_neighbors=(30,) * 4,
        num_views=5, image_height=120, image_width=160, batch_num=4,
        compute_dtype=jnp.bfloat16, remat=remat,
    )
    model = MVKPConv(cfg)
    spec = cfg.pyramid_spec()
    batch = {k: jnp.asarray(v) for k, v in _make_batch(cfg, 4, rng).items()}
    pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, spec))(
        batch["points"], batch["mask"])
    variables = jit_init(model, batch, pyr0)
    tx = make_optimizer(cfg, frozen_prefixes=("net_2d",))
    apply_fn = make_apply_fn(model, cfg, "mvkpconv")
    train_step = make_train_step(apply_fn, tx, cfg, donate=False)
    state0 = create_train_state(variables, tx)

    @jax.jit
    def timed_train(state, batch):
        def body(_, s):
            s, _m = train_step(s, batch)
            return s
        return jax.lax.fori_loop(0, iters, body, state)

    s1 = timed_train(state0, batch)
    float(jnp.sum(s1.step))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sN = timed_train(state0, batch)
        float(jnp.sum(sN.step))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    print(f"remat={remat:7s} {dt*1000:8.2f} ms/step  "
          f"{4*16384/dt:,.0f} pts/s", flush=True)
