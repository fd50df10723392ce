"""Windowed one-hot-matmul segment-sum transpose (candidate gen 2).

Key idea: after sorting rows by target, each 512-row block's rows hit at
most 513 DISTINCT targets. Mapping targets to their compressed rank among
non-empty targets bounds each block's output span to a static window
W=520, so the per-block segment-sum becomes a (W,512)x(512,C) ONE-HOT
MATMUL (MXU, exact 0/1 weights, f32 accumulation) and the combine step a
windowed scatter-add of NBLK dense (W,C) slabs — no per-row scatter
anywhere. A final 65k-row remap expands compressed ranks back to targets.

Stages (argsort/perm-take measured in prof_scatter2: 5.2 / 6.6 ms):
  rnk       is_new + blocked cumsum -> compressed rank per row
  onehot    per-block (W,512) one-hot matmul -> window slabs
  combine   windowed scatter-add of slabs into the compressed array
  remap     starts -> nonempty -> rank_of_t -> take
  e2e       the whole pipeline from (ct, idx)

Exactness vs numpy float64 oracle checked first (runs on CPU too).
Run: python scratch/prof_scatter5.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

if os.environ.get("SMALL") == "1":
    # the axon plugin ignores JAX_PLATFORMS from the env; config sticks
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

ITERS = int(os.environ.get("PS_ITERS", 16))

if os.environ.get("SMALL") == "1":  # CPU-sized exactness run
    B, N, K, C = 2, 512, 6, 8
    BLK, W = 64, 72
else:
    B, N, K, C = 4, 16384, 30, 32
    BLK, W = 512, 520  # W >= BLK+1
ROWS = B * N * K
TGTS = B * (N + 1)
NBLK = ROWS // BLK
assert ROWS % BLK == 0

rng = np.random.RandomState(0)
idx_np = np.minimum(rng.randint(0, N + 1, (B, N, K)), N).astype(np.int32)
base = (np.arange(B, dtype=np.int32) * (N + 1))[:, None, None]
flat_idx = (idx_np + base).reshape(-1)
idx = jnp.asarray(flat_idx)
ct = jnp.asarray(rng.randn(ROWS, C), jnp.float32)


def blocked_cumsum_1d(v):
    """Cumsum over a long 1-D int/float vector via (nblk, BLK) blocks."""
    n = v.shape[0]
    pad = (-n) % BLK
    vp = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)]) if pad else v
    nb = vp.shape[0] // BLK
    inner = jnp.cumsum(vp.reshape(nb, BLK), axis=1)
    btot = inner[:, -1]
    bpre = jnp.concatenate([jnp.zeros((1,), v.dtype), jnp.cumsum(btot)])[:-1]
    return (inner + bpre[:, None]).reshape(-1)[:n]


def transpose_window(ct_, idx_):
    iota = jnp.arange(ROWS, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort((idx_, iota), num_keys=1)
    rows = jnp.take(ct_.astype(jnp.float32), perm, axis=0)
    rows = jax.lax.optimization_barrier(rows)

    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_idx[1:] != sorted_idx[:-1]).astype(jnp.int32)]
    )
    rnk = blocked_cumsum_1d(is_new) - 1          # compressed rank per row
    rnk_lo = rnk.reshape(NBLK, BLK)[:, 0]        # window base per block
    off = (rnk.reshape(NBLK, BLK) - rnk_lo[:, None]).astype(jnp.int32)

    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (NBLK, W, BLK), 1)
        == off[:, None, :]
    ).astype(jnp.float32)
    # exact: 0/1 weights, f32 rows, f32 accumulation
    slabs = jax.lax.dot_general(
        onehot, rows.reshape(NBLK, BLK, C),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (NBLK, W, C)

    ndistinct = TGTS + W  # upper bound pad
    compressed = jnp.zeros((ndistinct, C), jnp.float32)
    compressed = jax.lax.scatter_add(
        compressed,
        rnk_lo[:, None],
        slabs,
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        ),
        indices_are_sorted=True,
        unique_indices=False,
    )

    starts = jnp.searchsorted(
        sorted_idx, jnp.arange(TGTS + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    nonempty = (starts[1:] != starts[:-1]).astype(jnp.int32)
    rank_of_t = blocked_cumsum_1d(nonempty) - 1
    out = jnp.take(compressed, jnp.maximum(rank_of_t, 0), axis=0)
    return out * nonempty.astype(jnp.float32)[:, None]


# ---- exactness ----
ref = np.zeros((TGTS, C), np.float64)
np.add.at(ref, flat_idx, np.asarray(ct, np.float64))
got = np.asarray(jax.jit(transpose_window)(ct, idx))
err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
print(f"window exactness rel-err: {err:.2e}", flush=True)
assert err < 1e-4, "windowed transpose wrong"


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


if __name__ == "__main__" and os.environ.get("SKIP_TIMING") != "1":
    v = chain(transpose_window, ct, idx)
    print(f"window e2e {v*1e3:8.2f} ms   {ROWS/v/1e6:8.1f} M rows/s", flush=True)
