"""Census of every gather-transpose site in the flagship train step.

Recreates the round-5 site census cited from RESULTS.md: traces the bench
train step (jax.eval_shape — no device compute, runs anywhere) with the
gather VJP instrumented, and prints one row per transpose site:

    rows (b*nq*k), ns (source rows), c (channels) -> route

where route is one of
    banded[global]      single kernel call over the whole batch
    banded[batch-split] per-batch-element kernel calls (ndistinct / b)
    scatter[fallback]   _transpose_banded bailed to the scatter
    scatter[direct]     site traced with mode='scatter'

Run:  python scratch/sites_r5.py        (CPU is fine; trace only)
Output is the table RESULTS.md's "site census" paragraph summarizes;
saved copy: results/r5/sites_census.txt.
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops import gather as G
from mvkpconv_tpu.ops.pallas.segsum import _pick_packing
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.init import jit_init
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import (
    create_train_state,
    make_apply_fn,
    make_train_step,
)
from __graft_entry__ import _make_batch


def census():
    cfg = KPConfig(
        fusion="early",
        in_features_dim=66,
        num_points=(16384, 4096, 1024, 256, 64),
        conv_neighbors=(30, 30, 30, 30, 30),
        pool_neighbors=(30, 30, 30, 30),
        num_views=5,
        image_height=120,
        image_width=160,
        batch_num=4,
        compute_dtype=jnp.bfloat16,
    )
    b = cfg.batch_num
    model = MVKPConv(cfg)
    spec = cfg.pyramid_spec()
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in _make_batch(cfg, b, rng).items()}
    pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, spec))(
        batch["points"], batch["mask"]
    )
    variables = jit_init(model, batch, pyr0)
    tx = make_optimizer(cfg, frozen_prefixes=("net_2d",))
    apply_fn = make_apply_fn(model, cfg, "mvkpconv")
    train_step = make_train_step(apply_fn, tx, cfg, donate=False)
    state0 = create_train_state(variables, tx)

    sites = []
    in_banded = [False]
    orig_banded, orig_scatter = G._transpose_banded, G._transpose_scatter

    def classify_banded(ct, index, feat_shape):
        # re-derive _transpose_banded's routing decision (gather.py:373-389)
        batch_shape = index.shape[:-2]
        ns, c = feat_shape[-2], feat_shape[-1]
        nb = int(np.prod(batch_shape)) if batch_shape else 1
        ns8 = -(-ns // 8) * 8
        nwin = min(-(-ns // G._BANDED_SUB), G._BANDED_NWIN)
        budget = 10 * 1024 * 1024
        try:
            c_blk, _, _ = _pick_packing(c, G._BANDED_SUB, nb * ns8, nwin, budget)
        except ValueError:
            c_blk = 0
        if c_blk >= c:
            return "banded[global]"
        try:
            c_blk, _, _ = _pick_packing(c, G._BANDED_SUB, ns8, nwin, budget)
        except ValueError:
            c_blk = 0
        if c_blk >= c and nb > 1:
            return "banded[batch-split]"
        return "scatter[fallback]"

    def spy_banded(ct, index, feat_shape, interpret=None):
        ns, c = feat_shape[-2], feat_shape[-1]
        rows = int(np.prod(index.shape))
        sites.append((rows, ns, c, str(ct.dtype), classify_banded(ct, index, feat_shape)))
        in_banded[0] = True
        try:
            return orig_banded(ct, index, feat_shape, interpret=interpret)
        finally:
            in_banded[0] = False

    def spy_scatter(ct, index, feat_shape):
        if not in_banded[0]:
            ns, c = feat_shape[-2], feat_shape[-1]
            sites.append(
                (int(np.prod(index.shape)), ns, c, str(ct.dtype), "scatter[direct]")
            )
        return orig_scatter(ct, index, feat_shape)

    G._transpose_banded, G._transpose_scatter = spy_banded, spy_scatter
    try:
        jax.eval_shape(train_step, state0, batch)
    finally:
        G._transpose_banded, G._transpose_scatter = orig_banded, orig_scatter

    mode = getattr(cfg, "gather_transpose", "?")
    print(f"gather-transpose site census (mode={mode}, B={b}, bench config)")
    print(f"{'rows':>10} {'ns':>8} {'c':>6} {'ct dtype':>9}  route")
    total = 0
    for rows, ns, c, dt, route in sorted(sites, reverse=True):
        total += rows
        print(f"{rows:>10,} {ns:>8,} {c:>6} {dt:>9}  {route}")
    n_scatter = sum(1 for s in sites if s[4].startswith("scatter"))
    sc_rows = sum(s[0] for s in sites if s[4].startswith("scatter"))
    print(
        f"-- {len(sites)} sites, {total:,} transpose rows/step; "
        f"{n_scatter} on scatter ({sc_rows:,} rows = {100*sc_rows/max(total,1):.2f}%)"
    )


if __name__ == "__main__":
    buf = io.StringIO()
    with redirect_stdout(buf):
        census()
    text = buf.getvalue()
    sys.stdout.write(text)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "r5", "sites_census.txt")
    with open(out, "w") as f:
        f.write(text)
