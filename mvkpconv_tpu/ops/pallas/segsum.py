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

Each grid step accumulates its (W, c_blk) slab into a VMEM-resident
output at dynamic offset rnk_lo[block] (read-modify-write entirely in
VMEM). VMEM tiles are (8, 128), so a narrow c_blk would waste 128-c_blk
lanes of the resident block — at L0 bench shape (66k distinct targets,
C=32) that is 33.8 MB against ~16 MB of VMEM. The output is therefore
LANE-PACKED: pk = 128 // c_blk consecutive virtual rows share one
128-lane packed row, and each slab is shifted by (base % pk) rows before
a (W/pk, 128) reshape so the dynamic-slice accumulate lands on packed
rows. The caller unpacks with one XLA reshape.

The caller (ops/gather.py:_transpose_window) does the XLA-side sort,
rank compression and rank→target remap.

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


def _kernel(rnk_lo_ref, off_ref, rows_ref, out_ref, *, w, blk, pk, c_blk):
    from jax.experimental import pallas as pl

    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    off = off_ref[...]  # (BLK,) int32
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (w, blk), 0) == off[None, :]
    ).astype(jnp.float32)
    slab = jax.lax.dot_general(
        onehot,
        rows_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: default precision truncates the f32 rows to bf16 before
        # the MXU multiply (measured 1.8e-3 rel-err); the 0/1 weights are
        # exact either way, the ROWS need the 3-pass decomposition
        precision=jax.lax.Precision.HIGHEST,
    )  # (W, c_blk)
    base = rnk_lo_ref[bi]
    if pk == 1:
        out_ref[pl.ds(base, w), :] = out_ref[pl.ds(base, w), :] + slab
        return
    # lane-packed accumulate: virtual row base+i lands on packed row
    # (base+i)//pk at lane group (base+i)%pk. Shift the slab down by
    # r0 = base%pk rows inside a (w+pk, c_blk) zero frame, then fold pk
    # rows into the 128 lanes.
    r0 = base % pk
    wp = (w + pk) // pk  # packed rows per slab (w % pk == 0 by contract)
    frame = jnp.zeros((w + pk, c_blk), jnp.float32)
    frame = jax.lax.dynamic_update_slice(frame, slab, (r0, 0))
    packed = frame.reshape(wp, pk * c_blk)
    p0 = base // pk
    out_ref[pl.ds(p0, wp), :] = out_ref[pl.ds(p0, wp), :] + packed


def sorted_window_segsum(
    rows: jnp.ndarray,
    off: jnp.ndarray,
    rnk_lo: jnp.ndarray,
    ndistinct: int,
    blk: int = 512,
    w: int = 520,
    vmem_budget_bytes: int = 10 * 1024 * 1024,
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
      blk / w: rows per block / output window (w ≥ blk + 1, w % 8 == 0).
      vmem_budget_bytes: cap on the resident packed output block —
        channels are processed in chunks of ``c_blk`` columns, lane-packed
        pk = 128 // c_blk virtual rows per 128-lane packed row.

    Returns:
      (ndistinct, C) f32: out[j] = Σ rows[i] over rows with compressed
      rank j. Exact (0/1 one-hot weights, f32 MXU accumulation).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, c = rows.shape
    if r % blk:
        raise ValueError(f"rows count {r} not a multiple of blk={blk}")
    if w < blk + 1 or w % 8:
        raise ValueError(f"w={w} must be >= blk+1 and a multiple of 8")
    nblk = r // blk

    # pick (c_blk, pk): packed block rows = ceil(ndist_pad/pk), pk*c_blk
    # lanes; pk is additionally capped by divisibility of w
    max_pk = 1
    while w % (max_pk * 2) == 0:
        max_pk *= 2
    chosen = None
    for c_blk in (128, 64, 32, 16, 8):
        if c_blk > c and c_blk != 8:
            continue
        pk = min(128 // c_blk, max_pk)
        ndist_pad = ndistinct + w + pk
        rows_p = -(-ndist_pad // pk)
        # VMEM tiles are (8, 128): blocks narrower than 128 lanes still
        # occupy 128 — budget with the padded width
        if rows_p * max(pk * c_blk, 128) * 4 <= vmem_budget_bytes:
            chosen = (c_blk, pk, rows_p)
            break
    if chosen is None:
        raise ValueError(
            f"no lane packing fits ndistinct={ndistinct} in "
            f"{vmem_budget_bytes} bytes of VMEM"
        )
    c_blk, pk, rows_p = chosen
    ndist_pad = rows_p * pk
    c_pad = (-c) % c_blk
    if c_pad:
        rows = jnp.pad(rows, ((0, 0), (0, c_pad)))
    c_chunks = (c + c_pad) // c_blk

    grid = (c_chunks, nblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # 1-D: Mosaic rejects a (1, blk) 2-D block (second-minor dim
            # must be divisible by 8 or equal the array dim)
            pl.BlockSpec((blk,), lambda ci, bi, s: (bi,)),
            pl.BlockSpec((blk, c_blk), lambda ci, bi, s: (bi, ci)),
        ],
        out_specs=pl.BlockSpec(
            (rows_p, pk * c_blk), lambda ci, bi, s: (0, ci)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w=w, blk=blk, pk=pk, c_blk=c_blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (rows_p, c_chunks * pk * c_blk), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(rnk_lo, off, rows)
    # unpack: each (rows_p, pk*c_blk) chunk is pk virtual rows × c_blk
    chunks = [
        out[:, j * pk * c_blk:(j + 1) * pk * c_blk].reshape(
            ndist_pad, c_blk
        )[:ndistinct]
        for j in range(c_chunks)
    ]
    return jnp.concatenate(chunks, axis=1)[:, :c] if c_chunks > 1 else (
        chunks[0][:, :c]
    )
