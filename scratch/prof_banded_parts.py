"""Decompose _transpose_banded cost at the real L0 sites: kernel alone vs
full transpose (XLA-side prep/shadow/residual). Run on TPU."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from mvkpconv_tpu.ops.gather import _transpose_banded, _transpose_scatter, _BANDED_SUB, _BANDED_NWIN
from mvkpconv_tpu.ops.pallas.segsum import banded_window_segsum

ITERS = int(os.environ.get("SS_ITERS", 16))

def chain(fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            x0 = a[0] + (acc * 1e-20).astype(a[0].dtype)
            return acc + jnp.sum(fn(x0, *a[1:])).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
    float(loop(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS

rng = np.random.RandomState(0)
for name, (b, nq, k, ns, c, band) in {
    "L0c66": (4, 16384, 30, 16385, 66, 3400),
    "L0c32": (4, 16384, 30, 16385, 32, 3400),
}.items():
    q = (np.arange(nq)[None, :, None] * (ns / nq)).astype(np.int64)
    idx_np = np.clip(q + rng.randint(-band // 2, band // 2, (b, nq, k)), 0, ns - 2)
    idx_np[rng.rand(b, nq, k) < 0.06] = ns - 1
    idx = jnp.asarray(idx_np.astype(np.int32))
    ct = jnp.asarray(rng.randn(b, nq, k, c), np.float32).astype(jnp.bfloat16)
    shape = (b, ns, c)
    # prebaked kernel inputs (XLA side excluded)
    blk, sub = 512, _BANDED_SUB
    rpb = nq * k
    rpb_pad = -(-rpb // blk) * blk
    nwin = min(-(-ns // sub), _BANDED_NWIN)
    ns8 = -(-ns // 8) * 8
    idxb = idx_np.reshape(b, rpb).astype(np.int32)
    shadow = idxb == ns - 1
    off = np.where(shadow, -1, idxb)
    nblk_b = rpb_pad // blk
    offb = off.reshape(-1, blk)
    a_lo = np.where(offb < 0, 1 << 20, offb).min(1) // sub
    a_hi = offb.max(1) // sub
    base = np.repeat(np.arange(b, dtype=np.int32) * ns8, nblk_b)
    rows = jnp.asarray(ct.reshape(b * rpb, c))
    offj = jnp.asarray(off.reshape(-1))
    t_kern = chain(
        lambda r: banded_window_segsum(
            r, offj, jnp.asarray(base), jnp.asarray(a_lo.astype(np.int32)),
            jnp.asarray(a_hi.astype(np.int32)), b * ns8, nwin=nwin,
            blk=blk, sub=sub),
        rows,
    )
    t_full = chain(lambda ct_: _transpose_banded(ct_, idx, shape), ct)
    t_scat = chain(lambda ct_: _transpose_scatter(ct_, idx, shape), ct)
    print(f"{name}: kernel={t_kern*1e3:7.2f}ms full={t_full*1e3:7.2f}ms scatter={t_scat*1e3:7.2f}ms", flush=True)
