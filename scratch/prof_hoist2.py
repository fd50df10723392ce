"""Hoisted-consumer variants: can the bqkm,bqkc->bqmc einsum (a 65k-batch
of tiny (15x30)@(30x32) dots — MXU-hostile) be beaten by a fused
elementwise-multiply + k-reduction on the VPU, or by a layout swap?

Variants (all consume a cached bf16 all_w, L0 bench shapes):
  B  einsum bqkm,bqkc->bqmc + output matmul     (current consumer)
  E  mul-reduce: sum_k(allw[...,None]*nx[...,None,:]) + output matmul
  F  einsum bqkm,bqkc->bqcm + (C*M) output matmul (layout swap)
  G  support-side premul: z=x@W (B,Ns,M*Cout) gather z + mul-reduce over k,m
"""
import sys
sys.path.insert(0, "/root/repo")

import time
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops.gather import group_points, pad_shadow_row

B, N, K, M, CIN, COUT = 4, 16384, 30, 15, 32, 32
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, (B, N, K)), jnp.int32)
x = jnp.asarray(rng.randn(B, N, CIN), jnp.float32)
w = jnp.asarray(rng.randn(M, CIN, COUT), jnp.float32) * 0.1
all_w = jnp.asarray(rng.rand(B, N, K, M), jnp.float32).astype(jnp.bfloat16)

iters = 32


def chain_time(fn, *args, name=""):
    @jax.jit
    def timed(*a):
        def body(_, acc):
            return acc + fn(acc, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(timed(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    print(f"{name:52s} {dt*1000:8.3f} ms", flush=True)
    return dt


def consumer_B(acc, all_w, idx, x):
    xg = group_points(pad_shadow_row(x + acc * 1e-20), idx).astype(jnp.bfloat16)
    wf = jnp.einsum("bqkm,bqkc->bqmc", all_w, xg,
                    preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(
        wf.reshape(B, N, M * CIN).astype(jnp.bfloat16),
        w.reshape(M * CIN, COUT).astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.sum(out)


def consumer_E(acc, all_w, idx, x):
    xg = group_points(pad_shadow_row(x + acc * 1e-20), idx).astype(jnp.bfloat16)
    # (B,N,K,M,1) * (B,N,K,1,C) summed over K — force the VPU reduce form
    wf = jnp.sum(
        all_w[..., :, None] * xg[..., None, :], axis=2,
        dtype=jnp.float32,
    )  # (B,N,M,C)
    out = jax.lax.dot_general(
        wf.reshape(B, N, M * CIN).astype(jnp.bfloat16),
        w.reshape(M * CIN, COUT).astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.sum(out)


def consumer_F(acc, all_w, idx, x):
    xg = group_points(pad_shadow_row(x + acc * 1e-20), idx).astype(jnp.bfloat16)
    wf = jnp.einsum("bqkm,bqkc->bqcm", all_w, xg,
                    preferred_element_type=jnp.float32)
    w_cm = jnp.transpose(w, (1, 0, 2)).reshape(CIN * M, COUT)
    out = jax.lax.dot_general(
        wf.reshape(B, N, CIN * M).astype(jnp.bfloat16),
        w_cm.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.sum(out)


def consumer_G(acc, all_w, idx, x):
    # support-side premultiply: z[b,s,(m,o)] = x @ W  — one clean MXU matmul
    z = jax.lax.dot_general(
        (x + acc * 1e-20).astype(jnp.bfloat16),
        jnp.transpose(w, (1, 0, 2)).reshape(CIN, M * COUT).astype(jnp.bfloat16),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, Ns, M*COUT)
    zg = group_points(pad_shadow_row(z.astype(jnp.bfloat16)), idx)
    # out[bqo] = sum_k sum_m allw[bqkm] * zg[bqk,(m,o)]
    zg = zg.reshape(B, N, K, M, COUT)
    out = jnp.sum(all_w[..., None] * zg, axis=(2, 3), dtype=jnp.float32)
    return jnp.sum(out)


chain_time(consumer_B, all_w, idx, x, name="B einsum bqmc + matmul (current)")
chain_time(consumer_E, all_w, idx, x, name="E mul-reduce over k + matmul")
chain_time(consumer_F, all_w, idx, x, name="F einsum bqcm + (C*M) matmul")
chain_time(consumer_G, all_w, idx, x, name="G support premul + wide gather + mul-reduce")

# numeric sanity E/F/G vs B
ref = jax.jit(lambda a, i, xx: consumer_B(jnp.float32(0), a, i, xx))(all_w, idx, x)
for f, nm in ((consumer_E, "E"), (consumer_F, "F"), (consumer_G, "G")):
    got = jax.jit(lambda a, i, xx: f(jnp.float32(0), a, i, xx))(all_w, idx, x)
    print(f"{nm} rel err vs B: {abs(float(got)-float(ref))/abs(float(ref)):.2e}")
