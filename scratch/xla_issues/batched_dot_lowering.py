"""Repro: batched dot_general with small minor dims lowers far from peak.

einsum('bqkm,bqkc->bqmc') with B*Q large and K/M/C small is ~3.8 GFLOP —
10 us at v5e bf16 peak — but measures milliseconds. Compare against the
algebraically identical row-flattened GEMM formulation and dump both HLOs.

Run on TPU:  python scratch/xla_issues/batched_dot_lowering.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

B, Q, K, M, C = 4, 16384, 30, 15, 64
rng = np.random.RandomState(0)
infl = jnp.asarray(rng.rand(B, Q, K, M), jnp.bfloat16)
nx = jnp.asarray(rng.rand(B, Q, K, C), jnp.bfloat16)
ITERS = 32


def timed(fn, *args, name=""):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            out = fn(a[0] + acc * jnp.bfloat16(1e-8), *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS
    flops = 2 * B * Q * K * M * C
    print(f"{name:34s} {dt*1e3:8.3f} ms   {flops/dt/1e12:6.2f} TFLOP/s")
    return dt


def v_batched(infl, nx):
    return jnp.einsum("bqkm,bqkc->bqmc", infl, nx,
                      preferred_element_type=jnp.float32)


def v_flat_rows(infl, nx):
    # same contraction as one (B*Q*M, K) x (K, C) GEMM per... still batched,
    # but with the batch folded into rows of the LHS via transpose first:
    # (B*Q, M, K) @ (B*Q, K, C). Shows whether the (K,M) minor order alone
    # is the problem.
    lhs = jnp.swapaxes(infl.reshape(B * Q, K, M), 1, 2)  # (BQ, M, K)
    rhs = nx.reshape(B * Q, K, C)
    out = jax.lax.dot_general(
        lhs, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out.reshape(B, Q, M, C)


def v_one_gemm_per_m(infl, nx):
    # M separate large GEMM-like contractions: for each m, rows (B*Q) with
    # a length-K dot — expressed as elementwise-mul + reduce (VPU) to show
    # the compiler's alternative cost.
    w = infl.reshape(B * Q, K, M)
    x = nx.reshape(B * Q, K, C)
    out = jnp.einsum("rkm,rkc->rmc", w, x, preferred_element_type=jnp.float32)
    return out.reshape(B, Q, M, C)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    timed(v_batched, infl, nx, name="einsum bqkm,bqkc->bqmc")
    timed(v_flat_rows, infl, nx, name="pre-transposed batched dot")
    timed(v_one_gemm_per_m, infl, nx, name="row-flattened einsum")
    hlo = jax.jit(v_batched).lower(infl, nx).compile().as_text()
    open("/tmp/batched_dot.hlo", "w").write(hlo)
    convs = [l for l in hlo.splitlines() if "convolution" in l or "fusion" in l]
    print(f"HLO -> /tmp/batched_dot.hlo ({len(hlo.splitlines())} lines, "
          f"{len(convs)} convolution/fusion lines)")
