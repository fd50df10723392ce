"""Decompose the CURRENT production resnetb block (hoisted-influence path)
into isolated sub-op timings at L0 bench shapes, plus the whole block, so
the residual composition glue (whole - sum(parts)) is visible.

Parts:
  g   feature gather              group_points(pad_shadow_row(x), inds)
  e1  influence einsum            bqkm,bqkc->bqmc (cached bf16 influence)
  e2  weight matmul               (B,Q,M*C) @ (M*C,Cout)
  u   unary matmul (mid width)    (B,Q,Cin) @ (Cin,mid) — unary1/shortcut
  bn  masked batch-norm (inference form) + leaky_relu + residual add
  blk the full ResnetBottleneckBlock.apply (non-strided, precomputed infl)

Run on TPU:  python scratch/prof_block_decomp.py [CIN] [COUT]
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

import os
B = int(os.environ.get("PB_B", 4))
N = int(os.environ.get("PB_N", 16384))
K, M = 30, 15
CIN = int(sys.argv[1]) if len(sys.argv) > 1 else 128
COUT = int(sys.argv[2]) if len(sys.argv) > 2 else 128
MID = COUT // 4
ITERS = 32

from mvkpconv_tpu.ops.gather import group_points, pad_shadow_row

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, N, CIN), jnp.float32)
inds = jnp.asarray(rng.randint(0, N + 1, (B, N, K)), jnp.int32)
infl = jnp.asarray(rng.rand(B, N, K, M), jnp.bfloat16)
w2 = jnp.asarray(rng.randn(M * MID, MID), jnp.bfloat16) * 0.1
wu = jnp.asarray(rng.randn(CIN, MID), jnp.bfloat16) * 0.1
mask = jnp.ones((B, N), bool)
nx_mid = jnp.asarray(rng.randn(B, N, K, MID), jnp.bfloat16)
wf_mid = jnp.asarray(rng.randn(B, N, M, MID), jnp.bfloat16)


def chain(fn, *args, name=""):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            out = fn(a[0] + (acc * 1e-20).astype(a[0].dtype), *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt


x_mid = jnp.asarray(rng.randn(B, N, MID), jnp.bfloat16)


def part_gather(x_mid, inds):
    # the block's gather runs at the bottleneck width (post-unary1)
    return group_points(pad_shadow_row(x_mid), inds)


def part_e1(nx, infl):
    return jnp.einsum("bqkm,bqkc->bqmc", infl, nx,
                      preferred_element_type=jnp.float32)


def part_e2(wf, w2):
    return jax.lax.dot_general(
        wf.reshape(B, N, M * MID).astype(jnp.bfloat16), w2,
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def part_unary(x, wu):
    return jax.lax.dot_general(x.astype(jnp.bfloat16), wu,
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def part_bn_act(h, mask):
    mu = jnp.mean(h, axis=(0, 1))
    v = jnp.var(h, axis=(0, 1))
    h = (h - mu) * jax.lax.rsqrt(v + 1e-5)
    return jax.nn.leaky_relu(h, 0.1) + h


def whole_block(x, inds, infl):
    import flax.linen as nn
    from mvkpconv_tpu.models import blocks as Bk
    from mvkpconv_tpu.ops.pyramid import Pyramid
    from mvkpconv_tpu.training.config import KPConfig

    cfg = KPConfig(num_points=(N,), conv_neighbors=(K,),
                   pool_neighbors=(), architecture=("resnetb",),
                   in_features_dim=CIN, compute_dtype=jnp.bfloat16)
    pyr = Pyramid(points=(jnp.zeros((B, N, 3)),), masks=(mask,),
                  neighbors=(inds,), pools=(), upsamples=())
    blk = Bk.ResnetBottleneckBlock("resnetb", CIN, COUT, 0.1, 0, cfg)
    variables = blk.init(jax.random.PRNGKey(0), x, pyr, False,
                         {("conv", 0): infl})

    def run(x, inds, infl):
        p = Pyramid(points=(jnp.zeros((B, N, 3)),), masks=(mask,),
                    neighbors=(inds,), pools=(), upsamples=())
        return blk.apply(variables, x, p, False, {("conv", 0): infl})

    return run


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  CIN={CIN} COUT={COUT} MID={MID}")
    tg = chain(part_gather, x_mid, inds, name="gather (mid-width feats)")
    t1 = chain(part_e1, nx_mid, infl, name="einsum1 bqkm,bqkc->bqmc")
    t2 = chain(part_e2, wf_mid, w2, name="einsum2 (B,Q,M*mid)@(M*mid,mid)")
    tu = chain(part_unary, x, wu, name="unary matmul (Cin->mid)") * 2
    h0 = jnp.asarray(rng.randn(B, N, COUT), jnp.float32)
    tb = chain(part_bn_act, h0, mask, name="BN+act+residual (x2-ish)") * 2
    run = whole_block(x, inds, infl)
    tw = chain(run, x, inds, infl, name="WHOLE resnetb block")
    parts = tg + t1 + t2 + tu + tb
    print(f"{'sum(parts)':40s} {parts*1e3:8.3f} ms")
    print(f"{'composition glue (whole - parts)':40s} {(tw-parts)*1e3:8.3f} ms")
