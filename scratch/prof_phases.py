"""Top-level phase decomposition of the bench inference step (round-4).

Times, at bench.py's exact config, each phase in isolation with the same
LICM-proofed chained fori_loop bench.py uses, so the numbers are directly
comparable to the 66.3 ms/step (988k pts/s) full-step figure:

  full        the whole infer step (pyramid + lift + cache + trunk + head)
  pyramid     build_pyramid alone (grid subsample + binmin selections)
  lift        lift_2d_features (UNet + pixel kNN + gather + aggregation)
  unet        UNet-ResNet34 forward over the 20 views alone
  pixknn      projective pixel-selection alone (Pallas pixel_select path)
  cache       build_influence_cache alone (per-level rigid influence)

trunk+head ≈ full − pyramid − lift − cache. Sharpens the round-3 split
(trunk 53 / pyramid 12 / pixel 11 / UNet 8.6 of 82.5 ms) at the current
code state to locate the remaining pool above the ~17 ms gather floor.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from mvkpconv_tpu.models import MVKPConv
    from mvkpconv_tpu.models.kpfcnn import build_influence_cache
    from mvkpconv_tpu.ops.pyramid import build_pyramid
    from mvkpconv_tpu.ops.unproject import (
        points_to_pixel_knn_projective,
        unproject_depth,
    )
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init

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
    print("devices:", jax.devices(), flush=True)

    iters = 32

    def timeit(name, fn):
        """fn(eps_scalar) -> scalar; chained so LICM can't hoist it."""

        @jax.jit
        def timed():
            def body(_, acc):
                return acc + fn(acc * 1e-20)

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        float(timed())  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(timed())
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / iters * 1e3
        print(f"{name:34s} {ms:8.3f} ms", flush=True)
        return ms

    spec_ = spec

    def full(eps):
        bt = dict(batch)
        bt["points"] = batch["points"] + eps
        pyr = build_pyramid(bt["points"], bt["mask"], spec_)
        return jnp.sum(model.apply(variables, bt, pyr, train=False))

    def pyramid_only(eps):
        pyr = build_pyramid(batch["points"] + eps, batch["mask"], spec_)
        return (
            jnp.sum(pyr.points[-1])
            + jnp.sum(pyr.neighbors[0]).astype(jnp.float32)
            + jnp.sum(pyr.upsamples[0]).astype(jnp.float32)
        )

    def lift_only(eps):
        bt = dict(batch)
        bt["points"] = batch["points"] + eps
        out = model.apply(
            variables, bt, bt["points"], False, method=MVKPConv.lift_2d_features
        )
        return jnp.sum(out)

    def unet_only(eps):
        imgs = batch["images"] + eps
        bb, v, h, w, _ = imgs.shape
        out = model.apply(
            variables,
            imgs.reshape(bb * v, h, w, 3),
            method=lambda m, im: m.net_2d(im, train=False),
        )
        return jnp.sum(out["feature"])

    image_xyz, _ = jax.jit(unproject_depth)(
        batch["depth"], batch["intrinsics"], batch["poses"]
    )

    def pixknn_only(eps):
        idx = points_to_pixel_knn_projective(
            batch["points"] + eps,
            image_xyz,
            batch["intrinsics"],
            batch["poses"],
            cfg.pixel_knn,
            window=cfg.pixel_window,
            method=getattr(cfg, "pixel_select", "approx"),
            patch_dtype=jnp.dtype(getattr(cfg, "pixel_patch_dtype", "float32")),
        )
        return jnp.sum(idx).astype(jnp.float32)

    from mvkpconv_tpu.models.kpfcnn import plan_architecture

    enc_plan, dec_plan, _ = plan_architecture(cfg)  # early fusion: cfg as-is

    def cache_only(eps):
        pyr = jax.tree.map(
            lambda x: x + eps if x.dtype == jnp.float32 else x, pyr0
        )
        infl = build_influence_cache(cfg, (enc_plan, dec_plan), pyr)
        return sum(jnp.sum(v).astype(jnp.float32) for v in infl.values())

    t_full = timeit("full infer step", full)
    t_pyr = timeit("pyramid (subsample+binmin)", pyramid_only)
    t_lift = timeit("lift_2d (unet+knn+gather+aggr)", lift_only)
    t_unet = timeit("  unet forward alone", unet_only)
    t_knn = timeit("  pixel kNN alone", pixknn_only)
    t_cache = timeit("influence cache", cache_only)
    print(
        f"{'derived trunk+head':34s} {t_full - t_pyr - t_lift - t_cache:8.3f} ms"
    )
    print(
        f"{'  lift residual (gather+aggr)':34s} {t_lift - t_unet - t_knn:8.3f} ms"
    )


if __name__ == "__main__":
    main()
