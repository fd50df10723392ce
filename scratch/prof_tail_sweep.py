"""Per-shape A/B of the KPConv K-contraction tail (einsum batched dot vs
VPU mul-reduce) at the EXACT (N, Cin) pairs the bench trunk traces —
decides the width threshold for tail='auto'. See RESULTS.md round 4."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.models.blocks import _kp_contract

B, K, M = 4, 30, 15
SHAPES = [  # (N, Cin, count-in-trunk) from the eval_shape spy at bench config
    (16384, 66, 1), (16384, 32, 1),
    (4096, 32, 1), (4096, 64, 2),
    (1024, 64, 1), (1024, 128, 2),
    (256, 128, 1), (256, 256, 2),
    (64, 256, 1), (64, 512, 2),
]
iters = 32
rng = np.random.RandomState(0)

def chain_time(fn, *args):
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
    return min(ts) / iters

totals = {"einsum": 0.0, "vpu": 0.0, "best": 0.0}
print(f"{'N':>6} {'Cin':>4} {'xN':>2} {'einsum ms':>10} {'vpu ms':>9} winner")
for n, c, cnt in SHAPES:
    infl = jnp.asarray(rng.rand(B, n, K, M), jnp.float32).astype(jnp.bfloat16)
    nx = jnp.asarray(rng.randn(B, n, K, c), jnp.float32).astype(jnp.bfloat16)
    def run(acc, infl, nx, tail):
        out = _kp_contract(infl * (1.0 + acc * 1e-20), nx, tail)
        return jnp.sum(out)
    te = chain_time(lambda acc, i, x: run(acc, i, x, "einsum"), infl, nx)
    tv = chain_time(lambda acc, i, x: run(acc, i, x, "vpu"), infl, nx)
    win = "vpu" if tv < te else "einsum"
    totals["einsum"] += te * cnt
    totals["vpu"] += tv * cnt
    totals["best"] += min(te, tv) * cnt
    print(f"{n:>6} {c:>4} {cnt:>2} {te*1e3:>10.3f} {tv*1e3:>9.3f} {win}")
print(f"trunk totals: einsum {totals['einsum']*1e3:.2f} ms, "
      f"vpu {totals['vpu']*1e3:.2f} ms, per-shape best {totals['best']*1e3:.2f} ms")
