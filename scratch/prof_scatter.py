"""Scatter-transpose variants at L0 bench shape (round-4 session-8).

The take-VJP scatter-add showed 41.5 ms at L0 in prof_bwd_block (bf16) —
7x the gather floor. Production cotangents are f32. Variants measured:

  take      flat gather (reference floor: rows at ~335M starts/s)
  scat_f32  .at[idx].add, f32 cotangent (the production take-VJP)
  scat_bf16 .at[idx].add, bf16 cotangent
  scat_srt  .at[sorted_idx].add(indices_are_sorted=True) (perm precomputed)
  segsum    jax.ops.segment_sum on pre-sorted rows (indices_are_sorted)
  cumsum    perm-gather + f32 cumsum + boundary-diff (exact segment sum;
            perm/starts precomputed from indices — in production they come
            from the non-differentiable pyramid phase)

All exact up to f32 reassociation. Run: python scratch/prof_scatter.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("PS_ITERS", 16))

B, N, K, C = 4, 16384, 30, 32
ROWS = B * N * K            # 1.97M flat rows
TGTS = B * (N + 1)          # flat targets incl. per-batch shadow row

rng = np.random.RandomState(0)
# flat production-like indices: each (b, q) row has K neighbors near q
idx_np = np.minimum(
    rng.randint(0, N + 1, (B, N, K)), N
).astype(np.int32)
base = (np.arange(B, dtype=np.int32) * (N + 1))[:, None, None]
flat_idx = (idx_np + base).reshape(-1)
idx = jnp.asarray(flat_idx)

perm_np = np.argsort(flat_idx, kind="stable").astype(np.int32)
sorted_idx_np = flat_idx[perm_np]
counts = np.bincount(flat_idx, minlength=TGTS)
starts_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
perm = jnp.asarray(perm_np)
sorted_idx = jnp.asarray(sorted_idx_np)
starts = jnp.asarray(starts_np)

ct = jnp.asarray(rng.randn(ROWS, C), jnp.float32)
src = jnp.asarray(rng.randn(TGTS, C), jnp.float32)


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


def f_take(src_, idx_):
    return jnp.take(src_, idx_, axis=0)


def f_scat(ct_, idx_):
    return jnp.zeros((TGTS, C), ct_.dtype).at[idx_].add(ct_)


def f_scat_srt(ct_, perm_, sorted_idx_):
    rows = jnp.take(ct_, perm_, axis=0)
    return jnp.zeros((TGTS, C), ct_.dtype).at[sorted_idx_].add(
        rows, indices_are_sorted=True
    )


def f_segsum(ct_, perm_, sorted_idx_):
    rows = jnp.take(ct_, perm_, axis=0)
    return jax.ops.segment_sum(
        rows, sorted_idx_, num_segments=TGTS, indices_are_sorted=True
    )


def f_cumsum(ct_, perm_, starts_):
    rows = jnp.take(ct_, perm_, axis=0)
    cs = jnp.cumsum(rows.astype(jnp.float32), axis=0)
    cs = jnp.concatenate([jnp.zeros((1, C), jnp.float32), cs], axis=0)
    return jnp.take(cs, starts_[1:], axis=0) - jnp.take(cs, starts_[:-1], axis=0)


# exactness spot-check (small but real)
ref = np.zeros((TGTS, C), np.float64)
np.add.at(ref, flat_idx, np.asarray(ct, np.float64))
got = np.asarray(f_cumsum(ct, perm, starts))
err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
print(f"cumsum exactness rel-err: {err:.2e}", flush=True)

r = {}
r["take"] = chain(f_take, src, idx)
r["scat_f32"] = chain(f_scat, ct, idx)
r["scat_bf16"] = chain(f_scat, ct.astype(jnp.bfloat16), idx)
r["scat_srt"] = chain(f_scat_srt, ct, perm, sorted_idx)
r["segsum"] = chain(f_segsum, ct, perm, sorted_idx)
r["cumsum"] = chain(f_cumsum, ct, perm, starts)
for k, v in r.items():
    print(f"{k:10s} {v*1e3:8.2f} ms   {ROWS/v/1e6:8.1f} M rows/s", flush=True)
