"""Scatter-transpose probe, round 2: cheap XLA variants + build costs.

  scat_f32   .at[idx].add baseline (33.98 ms in prof_scatter)
  scat_pib   .at[idx].add(mode='promise_in_bounds')
  scat_drop  .at[idx].add(mode='drop')
  argsort    jnp.argsort of the 1.97M int32 flat index (plan build cost)
  sortpair   lax.sort of (key, iota) pair (stable argsort the direct way)
  psum_blk   blocked two-level segment sum WITHOUT sort: scatter rows into
             per-k slabs? no — measures a K-slab reduction: reshape rows
             (B*N, K, C) and scatter per-k slice k-at-a-time (K scatters of
             66k rows each; tests whether many small scatters beat one big)

Run: python scratch/prof_scatter2.py
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

rng = np.random.RandomState(0)
idx_np = np.minimum(rng.randint(0, N + 1, (B, N, K)), N).astype(np.int32)
base = (np.arange(B, dtype=np.int32) * (N + 1))[:, None, None]
flat_idx = (idx_np + base).reshape(-1)
idx = jnp.asarray(flat_idx)
ct = jnp.asarray(rng.randn(ROWS, C), jnp.float32)


def chain(fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            x0 = a[0] + (acc * 1e-20).astype(a[0].dtype)
            out = fn(x0, *a[1:])
            first = out[0] if isinstance(out, (tuple, list)) else out
            return acc + jnp.sum(first).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def f_scat(ct_, idx_):
    return jnp.zeros((TGTS, C), ct_.dtype).at[idx_].add(ct_)


def f_scat_pib(ct_, idx_):
    return jnp.zeros((TGTS, C), ct_.dtype).at[idx_].add(
        ct_, mode="promise_in_bounds"
    )


def f_scat_drop(ct_, idx_):
    return jnp.zeros((TGTS, C), ct_.dtype).at[idx_].add(ct_, mode="drop")


def f_argsort(idx_f, _):
    return jnp.argsort(idx_f)


def f_sortpair(idx_f, iota):
    k, v = jax.lax.sort((idx_f, iota), num_keys=1)
    return v


def f_scat_perk(ct_, idxbk):
    # K scatters of (B*N, C) each — does XLA overlap/parallelize them?
    ct3 = ct_.reshape(B * N, K, C)
    out = jnp.zeros((TGTS, C), ct_.dtype)
    for k in range(K):
        out = out.at[idxbk[:, k]].add(ct3[:, k, :], mode="promise_in_bounds")
    return out


idx_f32key = idx  # int32 keys fine for sort
iota = jnp.arange(ROWS, dtype=jnp.int32)
idx_bk = jnp.asarray((idx_np + base).reshape(B * N, K))

# --- sorted segment-sum via BLOCKED cumsum (exact scatter replacement) ----
BLK = 512
assert ROWS % BLK == 0
perm_np = np.argsort(flat_idx, kind="stable").astype(np.int32)
counts = np.bincount(flat_idx, minlength=TGTS)
starts_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
perm = jnp.asarray(perm_np)
starts = jnp.asarray(starts_np)


def f_sorted_blocked(ct_, perm_, starts_):
    rows = jnp.take(ct_, perm_, axis=0).astype(jnp.float32)
    inner = jnp.cumsum(rows.reshape(ROWS // BLK, BLK, C), axis=1)
    btot = inner[:, -1, :]
    bpre_ex = jnp.concatenate(
        [jnp.zeros((1, C), jnp.float32), jnp.cumsum(btot, axis=0)[:-1]], 0
    )
    inner_flat = inner.reshape(ROWS, C)
    p = starts_  # (TGTS+1,) boundary positions in [0, ROWS]
    in_blk = jnp.take(
        inner_flat, jnp.maximum(p - 1, 0), axis=0
    ) * (p % BLK != 0)[:, None]
    cs = in_blk + jnp.take(bpre_ex, jnp.minimum(p // BLK, ROWS // BLK - 1), axis=0)
    return cs[1:] - cs[:-1]


def f_blocked_cumsum_only(rows3, _):
    return jnp.cumsum(rows3, axis=1)


rows3_in = jnp.asarray(rng.randn(ROWS // BLK, BLK, C), jnp.float32)

# exactness check for the blocked pipeline
ref = np.zeros((TGTS, C), np.float64)
np.add.at(ref, flat_idx, np.asarray(ct, np.float64))
got = np.asarray(f_sorted_blocked(ct, perm, starts))
err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
print(f"sorted_blocked exactness rel-err: {err:.2e}", flush=True)

VARIANTS = [
    ("scat_f32", f_scat, (ct, idx)),
    ("scat_pib", f_scat_pib, (ct, idx)),
    ("scat_drop", f_scat_drop, (ct, idx)),
    ("argsort", f_argsort, (idx, iota)),
    ("sortpair", f_sortpair, (idx, iota)),
    ("srt_blkd", f_sorted_blocked, (ct, perm, starts)),
    ("blkcumsum", f_blocked_cumsum_only, (rows3_in, iota)),
]
for name, fn, args in VARIANTS:
    v = chain(fn, *args)
    print(f"{name:10s} {v*1e3:8.2f} ms   {ROWS/v/1e6:8.1f} M rows/s", flush=True)
