"""Windowed one-hot-matmul segment sum — the gather-transpose kernel.

The VJP of a neighbor gather is a segment sum of cotangent rows by target
row id. XLA's native lowering is a scatter-add at ~58M rows/s on v5e
(17 ns/row HBM read-modify-write); the train-step backward is ~6.6M rows
— 117.7 ms of a 119 ms backward (scratch/prof_scatter_share.py).

This kernel exploits two structural facts after sorting rows by target:
  1. a 512-row block touches at most 513 DISTINCT targets, so mapping
     targets to their compressed rank among non-empty targets bounds each
     block's output span to a static window W;
  2. a (W, BLK) one-hot matrix contracted with the block's (BLK, C) rows
     on the MXU computes all of the block's per-target partial sums in
     one exact f32 matmul (0/1 weights) — and built in VMEM the one-hot
     never exists in HBM (XLA would materialize ~4 GB of it at L0 bench
     shape).

Each grid step accumulates its (W, C) slab into a VMEM-resident output at
dynamic offset rnk_lo[block] (read-modify-write entirely in VMEM). The
caller (ops/gather.py:_transpose_window) does the XLA-side sort, rank
compression and rank→target remap.

No reference counterpart: the reference's backward is the CUDA scatter in
mvpnet/ops/cuda/group_points_kernel.cu / torch autograd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pallas_supported() -> bool:
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon")


def _kernel(rnk_lo_ref, off_ref, rows_ref, out_ref, *, w, blk):
    from jax.experimental import pallas as pl

    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    off = off_ref[0]  # (1, BLK) int32 → (BLK,)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (w, blk), 0) == off[None, :]
    ).astype(jnp.float32)
    slab = jax.lax.dot_general(
        onehot,
        rows_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (W, c_blk)
    base = rnk_lo_ref[bi]
    out_ref[pl.ds(base, w), :] = out_ref[pl.ds(base, w), :] + slab


def sorted_window_segsum(
    rows: jnp.ndarray,
    off: jnp.ndarray,
    rnk_lo: jnp.ndarray,
    ndistinct: int,
    blk: int = 512,
    w: int = 520,
    c_budget_bytes: int = 8 * 1024 * 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum pre-sorted rows into ``ndistinct`` compressed slots.

    Args:
      rows: (R, C) f32 cotangent rows sorted by target (R % blk == 0).
      off: (R,) int32 — compressed target rank of each row MINUS the
        block's base rank (each value in [0, w)).
      rnk_lo: (R // blk,) int32 — base compressed rank per block,
        nondecreasing.
      ndistinct: static upper bound on the number of distinct targets.
      blk / w: rows per block / output window (w ≥ blk + 1).
      c_budget_bytes: VMEM budget for the resident output block — channels
        are processed in chunks of ``c_blk`` columns each.

    Returns:
      (ndistinct, C) f32: out[j] = Σ rows[i] over rows with compressed
      rank j. Exact (0/1 one-hot weights, f32 MXU accumulation).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, c = rows.shape
    if r % blk:
        raise ValueError(f"rows count {r} not a multiple of blk={blk}")
    if w < blk + 1:
        raise ValueError(f"w={w} must be >= blk+1={blk + 1}")
    nblk = r // blk
    ndist_pad = ndistinct + w  # ds(base, w) must stay in bounds

    c_blk = max(1, min(c, c_budget_bytes // (ndist_pad * 4)))
    c_pad = (-c) % c_blk
    if c_pad:
        rows = jnp.pad(rows, ((0, 0), (0, c_pad)))
    c_chunks = (c + c_pad) // c_blk

    grid = (c_chunks, nblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk), lambda ci, bi, s: (bi, 0)),
            pl.BlockSpec((blk, c_blk), lambda ci, bi, s: (bi, ci)),
        ],
        out_specs=pl.BlockSpec(
            (ndist_pad, c_blk), lambda ci, bi, s: (0, ci)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w=w, blk=blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ndist_pad, c + c_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(rnk_lo, off.reshape(nblk, blk), rows)
    return out[:ndistinct, :c]
