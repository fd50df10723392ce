"""Localize the resnetb 'composition glue' (whole 16.7 ms vs 11.3 ms
sum-of-parts, outputs/r4/block_decomp.txt): time incrementally longer
prefixes of the block chain so the stage that adds more than its
standalone cost is exposed. L0 bench-trunk dims: in=64, mid=32, out=128.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.models.blocks import _kp_contract
from mvkpconv_tpu.ops.gather import group_points, pad_shadow_row

B, N, K, M = 4, 16384, 30, 15
CIN, MID, COUT = 64, 32, 128
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, (B, N, K)), jnp.int32)
x = jnp.asarray(rng.randn(B, N, CIN), jnp.float32).astype(jnp.bfloat16)
infl = jnp.asarray(rng.rand(B, N, K, M), jnp.float32).astype(jnp.bfloat16)
w1 = jnp.asarray(rng.randn(CIN, MID) * 0.1, jnp.bfloat16)          # unary1
wk = jnp.asarray(rng.randn(M * MID, MID) * 0.1, jnp.bfloat16)      # kp weights
w2 = jnp.asarray(rng.randn(MID, COUT) * 0.1, jnp.bfloat16)         # unary2
ws = jnp.asarray(rng.randn(CIN, COUT) * 0.1, jnp.bfloat16)         # shortcut

iters = 32


def chain_time(fn, name):
    @jax.jit
    def timed():
        def body(_, acc):
            return acc + fn(x * (1.0 + acc * 1e-20))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    float(timed())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)/iters*1e3:8.3f} ms", flush=True)


def st_unary(xx):
    return jax.lax.dot_general(xx, w1, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(jnp.bfloat16)

def st_gather(h):
    return group_points(pad_shadow_row(h), idx)

def st_contract(hk):
    return _kp_contract(infl, hk, "einsum")

def st_matmul(wf):
    return jax.lax.dot_general(
        wf.reshape(B, N, M * MID).astype(jnp.bfloat16), wk,
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)

def st_bn_act(o):
    mu = jnp.mean(o, axis=(0, 1), keepdims=True)
    v = jnp.var(o, axis=(0, 1), keepdims=True)
    return jax.nn.leaky_relu((o - mu) * jax.lax.rsqrt(v + 1e-5), 0.1)

def st_unary2(h):
    return jax.lax.dot_general(h.astype(jnp.bfloat16), w2,
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

def st_shortcut(xx, o):
    s = jax.lax.dot_general(xx, ws, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.nn.leaky_relu(o + s, 0.1)



def s(t):
    # barrier before the sum: a bare jnp.sum consumer lets XLA collapse the
    # preceding contraction into a different program (RESULTS.md round-4
    # microbenchmark-honesty finding)
    return jnp.sum(jax.lax.optimization_barrier(t).astype(jnp.float32))

chain_time(lambda xx: s(st_unary(xx)), "1 unary1")
chain_time(lambda xx: s(st_gather(st_unary(xx))), "2 +gather")
chain_time(lambda xx: s(st_contract(st_gather(st_unary(xx)))),
           "3 +contract")
chain_time(lambda xx: s(st_matmul(st_contract(st_gather(st_unary(xx))))),
           "4 +matmul")
chain_time(lambda xx: s(st_bn_act(
    st_matmul(st_contract(st_gather(st_unary(xx)))))), "5 +bn+act")
chain_time(lambda xx: s(st_unary2(st_bn_act(
    st_matmul(st_contract(st_gather(st_unary(xx))))))), "6 +unary2")
chain_time(lambda xx: s(st_shortcut(xx, st_unary2(st_bn_act(
    st_matmul(st_contract(st_gather(st_unary(xx)))))))), "7 +shortcut (whole)")

# isolation re-checks at the same dims
chain_time(lambda xx: s(st_gather(xx[..., :MID] * 1.0)), "iso gather (MID wide)")
hk0 = jnp.asarray(rng.randn(B, N, K, MID), jnp.float32).astype(jnp.bfloat16)
chain_time(lambda xx: s(_kp_contract(
    infl * (1.0 + jnp.sum(xx) * 0e0), hk0, "einsum")), "iso contract")
