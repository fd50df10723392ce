"""Serving-artifact throughput: does the jax.export deployment unit
(eval/export.py) run at parity with the live jitted step on the TPU?

Exports TWO programs at bench shapes (bench.py cfg):
  1. the single inference step (what tools/export_model ships) — per-call
     probs; timed with synced dispatches (relay RTT included, same for
     both sides, so the RATIO is the datum);
  2. a 16-iteration chained loop (LICM-proofed like bench.py) — amortizes
     the relay tax so the loop body's points/s is directly comparable to
     bench.py's inference number.

Prints one summary line per measurement; run via scratch/run_tpu_probes.sh.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from mvkpconv_tpu.eval.export import (
        ServingModel,
        batch_spec_for,
        export_inference,
    )
    from mvkpconv_tpu.models import MVKPConv
    from mvkpconv_tpu.ops.pyramid import build_pyramid
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init
    from jax import export as jax_export

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
    model = MVKPConv(cfg)
    spec = cfg.pyramid_spec()
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in _make_batch(cfg, cfg.batch_num, rng).items()}
    # The artifact's pytree contract is batch_spec_for's 7 keys; _make_batch
    # also carries 'labels' (training-only). Serve the exact contract.
    batch = {k: batch[k] for k in batch_spec_for(cfg, "mvkpconv")}
    pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, spec))(
        batch["points"], batch["mask"]
    )
    variables = jit_init(model, batch, pyr0)
    pts = cfg.batch_num * cfg.num_points[0]

    # ---- program 1: the shipped single-step artifact --------------------
    # tpu_custom_call exemption: the production pyramid uses the Pallas
    # bin-min kernel on TPU (same-fleet serving; see export_inference doc)
    t0 = time.perf_counter()
    data = export_inference(model, cfg, "mvkpconv", variables,
                            allow_custom_calls=("tpu_custom_call",))
    print(f"export: {len(data)/1e6:.1f} MB in {time.perf_counter()-t0:.1f}s")
    served = ServingModel.from_bytes(data)

    def live(b):
        pyr = build_pyramid(b["points"], b["mask"], spec)
        logits = model.apply(variables, b, pyr, train=False)
        return jax.nn.softmax(logits, axis=-1)

    live_jit = jax.jit(live)

    def timed(fn, tag, reps=6):
        float(jnp.sum(fn(batch)))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(batch)))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{tag}: {dt*1e3:.1f} ms/dispatch -> {pts/dt:,.0f} pts/s "
              f"(relay RTT included)")
        return dt

    d_live = timed(live_jit, "single-step live jit")
    d_srv = timed(served, "single-step served   ")
    print(f"single-step served/live ratio: {d_srv/d_live:.3f}")

    # ---- program 2: chained loop, relay tax amortized --------------------
    iters = 16

    def loop(b):
        def body(_, acc):
            bt = dict(b)
            bt["points"] = b["points"] + acc * 1e-20
            pyr = build_pyramid(bt["points"], bt["mask"], spec)
            logits = model.apply(variables, bt, pyr, train=False)
            return acc + jnp.sum(logits.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    spec_tree = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch
    )
    exp_loop = jax_export.export(
        jax.jit(loop),
        disabled_checks=[jax_export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call")],
    )(spec_tree)
    blob = bytes(exp_loop.serialize())
    reloaded = jax_export.deserialize(bytearray(blob))

    def timed_loop(fn, tag, reps=3):
        float(fn(batch))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(batch))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / iters
        print(f"{tag}: {dt*1e3:.2f} ms/step -> {pts/dt:,.0f} pts/s")
        return dt

    d_llive = timed_loop(jax.jit(loop), "loop live jit ")
    d_lsrv = timed_loop(reloaded.call, "loop served   ")
    print(f"loop served/live ratio: {d_lsrv/d_llive:.3f} "
          f"(artifact {len(blob)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
