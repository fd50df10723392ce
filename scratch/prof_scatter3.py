"""Self-contained sorted-segment-sum gather transpose, end-to-end cost.

This is the candidate custom-VJP backward for group_points: no
precomputed plan — the sort + boundary search run inside the VJP (XLA
CSE dedupes them across blocks sharing an index set). Measures:

  full      sortpair + perm-take + searchsorted + blocked-cumsum +
            boundary-diff  (everything the VJP would run)
  planless  same minus sortpair/searchsorted (plan passed in) — the
            marginal per-consumer cost when CSE shares the plan

Compared against the scat_f32 baseline from prof_scatter2.
Run: python scratch/prof_scatter3.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PS_ITERS", 16))

B, N, K, C = 4, 16384, 30, 32
ROWS = B * N * K
TGTS = B * (N + 1)
BLK = 512
assert ROWS % BLK == 0

rng = np.random.RandomState(0)
idx_np = np.minimum(rng.randint(0, N + 1, (B, N, K)), N).astype(np.int32)
base = (np.arange(B, dtype=np.int32) * (N + 1))[:, None, None]
flat_idx = (idx_np + base).reshape(-1)
idx = jnp.asarray(flat_idx)
ct = jnp.asarray(rng.randn(ROWS, C), jnp.float32)

perm_np = np.argsort(flat_idx, kind="stable").astype(np.int32)
counts = np.bincount(flat_idx, minlength=TGTS)
starts_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
perm_pre = jnp.asarray(perm_np)
starts_pre = jnp.asarray(starts_np)


def seg_from_plan(ct_, perm_, starts_):
    rows = jnp.take(ct_, perm_, axis=0).astype(jnp.float32)
    # barrier: without it XLA fuses the take into the cumsum's loop fusion
    # and re-evaluates the gather per window position
    rows = jax.lax.optimization_barrier(rows)
    inner = jnp.cumsum(rows.reshape(ROWS // BLK, BLK, C), axis=1)
    inner = jax.lax.optimization_barrier(inner)
    btot = inner[:, -1, :]
    # exclusive block prefix, length ROWS//BLK + 1 (position ROWS lands in
    # the virtual block past the end: prefix of ALL blocks)
    bpre_ex = jnp.concatenate(
        [jnp.zeros((1, C), jnp.float32), jnp.cumsum(btot, axis=0)], 0
    )
    inner_flat = inner.reshape(ROWS, C)
    p = starts_
    in_blk = jnp.take(
        inner_flat, jnp.maximum(p - 1, 0), axis=0
    ) * (p % BLK != 0)[:, None]
    cs = in_blk + jnp.take(bpre_ex, p // BLK, axis=0)
    return cs[1:] - cs[:-1]


def f_full(ct_, idx_):
    iota = jnp.arange(ROWS, dtype=jnp.int32)
    sorted_idx, perm_ = jax.lax.sort((idx_, iota), num_keys=1)
    starts_ = jnp.searchsorted(sorted_idx, jnp.arange(TGTS + 1, dtype=jnp.int32))
    return seg_from_plan(ct_, perm_, starts_.astype(jnp.int32))


def f_planless(ct_, perm_, starts_):
    return seg_from_plan(ct_, perm_, starts_)


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


ref = np.zeros((TGTS, C), np.float64)
np.add.at(ref, flat_idx, np.asarray(ct, np.float64))
got = np.asarray(f_full(ct, idx))
err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
print(f"f_full exactness rel-err: {err:.2e}", flush=True)

for name, fn, args in [
    ("full", f_full, (ct, idx)),
    ("planless", f_planless, (ct, perm_pre, starts_pre)),
]:
    v = chain(fn, *args)
    print(f"{name:10s} {v*1e3:8.2f} ms   {ROWS/v/1e6:8.1f} M rows/s", flush=True)
