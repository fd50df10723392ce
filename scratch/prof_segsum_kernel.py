"""Isolated banded-segsum kernel compile + correctness + timing on TPU.

Iterating Mosaic lowering issues on the full train step costs a 10-minute
compile per attempt; this drives the kernel alone, one (c_blk, pk) combo
per pallas_call, at the L0 bench shape.

Run: python scratch/prof_segsum_kernel.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops.gather import _transpose_banded, _transpose_scatter

ITERS = int(os.environ.get("SS_ITERS", 16))


def chain(fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            x0 = a[0] + (acc * 1e-20).astype(a[0].dtype)
            out = fn(x0, *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def banded_indices(rng, b, nq, k, ns, band, shadow_frac):
    """Voxel-sorted-like: targets near the query's position, plus shadows."""
    q = (np.arange(nq)[None, :, None] * (ns / nq)).astype(np.int64)
    idx = np.clip(q + rng.randint(-band // 2, band // 2, (b, nq, k)), 0, ns - 2)
    idx[rng.rand(b, nq, k) < shadow_frac] = ns - 1
    return idx.astype(np.int32)


rng = np.random.RandomState(0)
for name, (b, nq, k, ns, c, band, dt) in {
    "L0conv_bf16": (4, 16384, 30, 16385, 35, 3400, jnp.bfloat16),
    "L0conv_f32": (4, 16384, 30, 16385, 35, 3400, jnp.float32),
    "L1conv_bf16": (4, 4096, 30, 4097, 67, 1500, jnp.bfloat16),
    "ups0_c256_bf16": (4, 16384, 1, 4097, 256, 500, jnp.bfloat16),
    "deep_c131_bf16": (4, 256, 30, 257, 131, 200, jnp.bfloat16),
}.items():
    print("CASE", name, flush=True)
    idx = jnp.asarray(banded_indices(rng, b, nq, k, ns, band, 0.06))
    ct = jnp.asarray(rng.randn(b, nq, k, c), jnp.float32).astype(dt)
    shape = (b, ns, c)
    try:
        d_band = jax.jit(
            lambda ct_, i_: _transpose_banded(ct_, i_, shape)
        )(ct, idx)
        d_ref = jax.jit(
            lambda ct_, i_: _transpose_scatter(ct_.astype(jnp.float32), i_, shape)
        )(ct, idx)
        err = float(
            jnp.max(jnp.abs(d_band.astype(jnp.float32) - d_ref))
            / (jnp.max(jnp.abs(d_ref)) + 1e-9)
        )
        t_band = chain(lambda ct_: _transpose_banded(ct_, idx, shape), ct)
        t_scat = chain(
            lambda ct_: _transpose_scatter(ct_, idx, shape), ct
        )
        rows = b * nq * k
        print(
            f"{name:18s} rows={rows/1e6:5.2f}M relerr={err:.2e} "
            f"banded={t_band*1e3:7.2f}ms scatter={t_scat*1e3:7.2f}ms "
            f"({rows/t_band/1e6:6.0f}M vs {rows/t_scat/1e6:6.0f}M rows/s)",
            flush=True,
        )
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if "Mosaic" in l or "error" in l.lower()), msg[0] if msg else "?")
        print(f"{name:18s} FAILED: {head[:180]}", flush=True)
