"""Repro: small-minor-dim operands get lane-padded layouts + explicit copies.

A (B, N, K, M) tensor with M=15 minor is lane-padded 15->128 in the tiled
HBM layout (~8.5x read inflation), and consumers preferring a different
minor order get explicit copy/transpose ops instead of layout-fused reads.
This tensor is the hoisted KPConv influence cache, read by all 14 trunk
blocks — the copies repeat per block.

Run on TPU:  python scratch/xla_issues/minor_dim_layout_copies.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

B, Q, K, M, C = 4, 16384, 30, 15, 64
ITERS = 32
rng = np.random.RandomState(0)
nx = jnp.asarray(rng.rand(B, Q, K, C), jnp.bfloat16)


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
    print(f"{name:44s} {min(ts)/ITERS*1e3:8.3f} ms")


def consume_km(w, nx):  # stored (..., K, M): contraction wants M-major reads
    return jnp.einsum("bqkm,bqkc->bqmc", w, nx,
                      preferred_element_type=jnp.float32)


def consume_mk(w, nx):  # stored (..., M, K): K minor (30 -> pads 128, 4.3x)
    return jnp.einsum("bqmk,bqkc->bqmc", w, nx,
                      preferred_element_type=jnp.float32)


def consume_flat(w, nx):  # stored (..., K*M): minor 450 -> pads 512 (1.14x)
    return jnp.einsum("bqkm,bqkc->bqmc", w.reshape(B, Q, K, M), nx,
                      preferred_element_type=jnp.float32)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    w_km = jnp.asarray(rng.rand(B, Q, K, M), jnp.bfloat16)
    w_mk = jnp.swapaxes(w_km, -1, -2)
    w_flat = w_km.reshape(B, Q, K * M)
    timed(consume_km, w_km, nx, name="influence stored (...,K,M), M=15 minor")
    timed(consume_mk, w_mk, nx, name="influence stored (...,M,K), K=30 minor")
    timed(consume_flat, w_flat, nx, name="influence stored flat (...,K*M=450)")
    hlo = jax.jit(consume_km).lower(w_km, nx).compile().as_text()
    open("/tmp/minor_layout.hlo", "w").write(hlo)
    copies = [l for l in hlo.splitlines()
              if " copy(" in l or " transpose(" in l]
    print(f"HLO -> /tmp/minor_layout.hlo; {len(copies)} copy/transpose ops:")
    for l in copies[:6]:
        print("  " + l.strip()[:120])
