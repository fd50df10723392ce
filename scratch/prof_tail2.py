"""Measure the hoisted-path KPConv tail (einsum + matmul) layout variants.

Hypothesis: (B,Nq,K,M) with M=15 minor pads to 128 lanes in HBM tiled
layout -> ~8.5x read inflation of the hoisted influence tensor. Compare:
  v0: current  einsum('bqkm,bqkc->bqmc', infl_f32, nx_bf16) + matmul
  v1: infl stored bf16 (cast once at hoist time)
  v2: infl stored (B,Nq,M,K)  (K=30 minor -> pads 128, 4.3x)
  v3: infl stored flat (B,Nq,K*M) minor 450->512, reshape at use
  v4: nx-major: einsum('bqmk,bqkc->bqmc') from the (M,K) layout
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

B, NQ, K, M, CIN, COUT = 4, 16384, 30, 15, 64, 64
iters = 10

rng = np.random.RandomState(0)
infl = jnp.asarray(rng.rand(B, NQ, K, M).astype(np.float32))
nx = jnp.asarray(rng.rand(B, NQ, K, CIN).astype(np.float32)).astype(jnp.bfloat16)
W = jnp.asarray(rng.randn(M * CIN, COUT).astype(np.float32)).astype(jnp.bfloat16)


def chain(fn, *args, name=""):
    @jax.jit
    def timed(*a):
        def body(_, acc):
            out = fn(acc, *a)
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(timed(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    print(f"{name:42s} {dt*1000:8.3f} ms", flush=True)
    return dt


def tail_v0(acc, infl, nx, W):
    i = infl + acc
    wf = jnp.einsum("bqkm,bqkc->bqmc", i.astype(jnp.bfloat16), nx,
                    preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(
        wf.reshape(B, NQ, M * CIN).astype(jnp.bfloat16), W,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out


infl_bf = infl.astype(jnp.bfloat16)


def tail_v1(acc, infl_bf, nx, W):
    i = infl_bf + acc.astype(jnp.bfloat16)
    wf = jnp.einsum("bqkm,bqkc->bqmc", i, nx, preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(
        wf.reshape(B, NQ, M * CIN).astype(jnp.bfloat16), W,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out


infl_mk = jnp.swapaxes(infl_bf, 2, 3)  # (B,NQ,M,K)


def tail_v4(acc, infl_mk, nx, W):
    i = infl_mk + acc.astype(jnp.bfloat16)
    wf = jnp.einsum("bqmk,bqkc->bqmc", i, nx, preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(
        wf.reshape(B, NQ, M * CIN).astype(jnp.bfloat16), W,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out


infl_flat = infl_bf.reshape(B, NQ, K * M)


def tail_v3(acc, infl_flat, nx, W):
    i = (infl_flat + acc.astype(jnp.bfloat16)).reshape(B, NQ, K, M)
    wf = jnp.einsum("bqkm,bqkc->bqmc", i, nx, preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(
        wf.reshape(B, NQ, M * CIN).astype(jnp.bfloat16), W,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out


# v5: contract k*m at once -- build nxm[bq, k*m, c] is worse. Instead:
# big-matmul form: out[bq,o] = sum_km infl[bq,km] * (nx W)[...]? not linear.
# v6: per-m VPU weighted sum (reads nx M times -- expected bad)

chain(tail_v0, infl, nx, W, name="v0 f32 (B,NQ,K,M) einsum")
chain(tail_v1, infl_bf, nx, W, name="v1 bf16 (B,NQ,K,M) einsum")
chain(tail_v4, infl_mk, nx, W, name="v4 bf16 (B,NQ,M,K) einsum")
chain(tail_v3, infl_flat, nx, W, name="v3 bf16 flat (B,NQ,450) reshape+einsum")

# bytes-accessed introspection for v0/v1
for name, fn, a in (("v0", tail_v0, infl), ("v1", tail_v1, infl_bf),
                    ("v4", tail_v4, infl_mk), ("v3", tail_v3, infl_flat)):
    c = (jax.jit(lambda acc, i, n, w, f=fn: f(acc, i, n, w))
         .lower(jnp.zeros(()), a, nx, W).compile().cost_analysis())
    if isinstance(c, list):
        c = c[0]
    print(f"{name}: bytes accessed {c.get('bytes accessed', 0)/1e6:.1f} MB, "
          f"flops {c.get('flops',0)/1e9:.2f} G", flush=True)
