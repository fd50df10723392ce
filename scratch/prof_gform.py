"""g-form KPConv: fold the (M,Cin,Cout) weights into SUPPORT features
BEFORE the neighbor gather, so the lane-hostile glue einsum
('bqkm,bqkc->bqmc', the batched-dot that XLA lowers badly — see
scratch/xla_issues/batched_dot_lowering.py) disappears.

    out[q,o] = Σ_k Σ_m infl[q,k,m] · Σ_c x[n(q,k),c] · W[m,c,o]
             = Σ_k Σ_m infl[q,k,m] · g[n(q,k),m,o],   g = x @ W  (one clean
                                                       MXU matmul over Ns)

Trade: the gather payload grows Cin → M·Cout (960 B/row bf16 at M=15,
Cout=32 — ABOVE the ~512 B free-payload threshold, so the gather goes
partly byte-bound: +~1.9 GB of HBM traffic per L0-sized block), in
exchange for deleting the (B,Nq,K,M)×(B,Nq,K,C) batched dot. Variants:

  v0: production path   gather(x) → einsum('bqkm,bqkc->bqmc') → matmul
  v1: g-form, batched dot  'bqj,bqjo->bqo' (j = K·M)
  v2: g-form, fused multiply-reduce (VPU): sum(infl[...,None]·gk, (2,3))
  v3: g-form, per-m loop: Σ_m infl[...,m:m+1] · gk[...,m,:] (M reads of
      the gathered block, no 5-D intermediate)

All variants share the SAME rigid influence tensor (hoisted per level in
production), so only the feature path differs. Numerics parity is asserted
in f32 at small shapes before timing.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax

if "--cpu" in sys.argv:  # the axon plugin ignores JAX_PLATFORMS=cpu from env
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mvkpconv_tpu.ops.gather import group_points, pad_shadow_row

iters = 10


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
    print(f"{name:46s} {dt * 1000:8.3f} ms", flush=True)
    return dt


def make_case(b, nq, ns, k, m, cin, cout, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(b, ns, cin).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, ns + 1, (b, nq, k)).astype(np.int32))
    infl = jnp.asarray(rng.rand(b, nq, k, m).astype(np.float32)).astype(dtype)
    W = jnp.asarray(rng.randn(m, cin, cout).astype(np.float32) * 0.1).astype(dtype)
    return x, idx, infl, W


def v0_production(acc, x, idx, infl, W):
    b, nq, k, m = infl.shape
    cin, cout = W.shape[1], W.shape[2]
    nx = group_points(pad_shadow_row(x + acc.astype(x.dtype)), idx)
    wf = jnp.einsum("bqkm,bqkc->bqmc", infl, nx, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        wf.reshape(b, nq, m * cin).astype(x.dtype),
        W.reshape(m * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gform_gather(acc, x, idx, W):
    b, ns, cin = x.shape
    m, _, cout = W.shape
    g = jax.lax.dot_general(  # (B, Ns, M·Cout): one clean MXU matmul
        x + acc.astype(x.dtype),
        W.transpose(1, 0, 2).reshape(cin, m * cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return group_points(pad_shadow_row(g), idx)  # (B, Nq, K, M·Cout)


def v1_gform_dot(acc, x, idx, infl, W):
    b, nq, k, m = infl.shape
    cout = W.shape[2]
    gk = _gform_gather(acc, x, idx, W)
    return jax.lax.dot_general(  # 'bqj,bqjo->bqo', j = K·M
        infl.reshape(b, nq, k * m),
        gk.reshape(b, nq, k * m, cout),
        dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )


def v2_gform_vpu(acc, x, idx, infl, W):
    b, nq, k, m = infl.shape
    cout = W.shape[2]
    gk = _gform_gather(acc, x, idx, W).reshape(b, nq, k, m, cout)
    return jnp.sum(infl[..., None] * gk, axis=(2, 3), dtype=jnp.float32)


def v3_gform_perm(acc, x, idx, infl, W):
    b, nq, k, m = infl.shape
    cout = W.shape[2]
    gk = _gform_gather(acc, x, idx, W).reshape(b, nq, k, m, cout)
    out = jnp.zeros((b, nq, cout), jnp.float32)
    for mm in range(m):
        out = out + jnp.sum(
            infl[..., mm : mm + 1] * gk[..., mm, :], axis=2, dtype=jnp.float32
        )
    return out


VARIANTS = [
    ("v0 production gather+einsum+matmul", v0_production),
    ("v1 g-form batched dot j=K*M", v1_gform_dot),
    ("v2 g-form fused VPU mul-reduce", v2_gform_vpu),
    ("v3 g-form per-m loop", v3_gform_perm),
]

# ---- parity (f32, small) ----
case = make_case(2, 64, 96, 8, 15, 16, 24, jnp.float32, seed=1)
ref = None
for name, fn in VARIANTS:
    out = np.asarray(jax.jit(fn)(jnp.zeros(()), *case))
    if ref is None:
        ref = out
    else:
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 1e-5, f"{name} parity {err}"
print("parity OK (f32 rel err < 1e-5)", flush=True)

# ---- timing at production shapes ----
if "--parity-only" in sys.argv or jax.devices()[0].platform == "cpu":
    print("cpu backend / --parity-only: skipping production-shape timing")
    sys.exit(0)
for tag, (b, nq, ns, k, m, cin, cout) in [
    ("L0 resnetb (Cin=Cout=64)", (4, 16384, 16384, 30, 15, 64, 64)),
    ("L0 bottleneck (Cin=Cout=32)", (4, 16384, 16384, 30, 15, 32, 32)),
    ("L0->L1 strided (Nq=4096)", (4, 4096, 16384, 30, 15, 64, 64)),
]:
    print(f"--- {tag} ---", flush=True)
    x, idx, infl, W = make_case(b, nq, ns, k, m, cin, cout, jnp.bfloat16)
    for name, fn in VARIANTS:
        chain(fn, x, idx, infl, W, name=name)
    for name, fn in VARIANTS:
        c = (
            jax.jit(fn)
            .lower(jnp.zeros(()), x, idx, infl, W)
            .compile()
            .cost_analysis()
        )
        if isinstance(c, list):
            c = c[0]
        print(
            f"  {name}: bytes {c.get('bytes accessed', 0) / 1e6:.0f} MB, "
            f"flops {c.get('flops', 0) / 1e9:.2f} G",
            flush=True,
        )
