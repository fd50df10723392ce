"""Windowed one-hot-matmul segment sum — the gather-transpose kernel.

The VJP of a neighbor gather is a segment sum of cotangent rows by target
row id. XLA's native lowering is a scatter-add at ~58M rows/s on v5e
(17 ns/row HBM read-modify-write); the train-step backward is ~6.6M rows
— 117.7 ms of a 119 ms backward (scratch/prof_scatter_share.py). Sorting
first does not help either: the permuted take of the sorted rows is a
random HBM access per row from a 252 MB source — 74.85 ms at the L0 bench
shape (scratch/prof_scatter4.py).

This kernel instead exploits the data pipeline's voxel-x-major point
order: in NATURAL row order, a 512-row cotangent block's targets live in
a bounded band (measured on the real bench pyramid, scratch/prof_band.py:
L0 conv band p99 = 3.4k of 16.4k targets, deeper levels <= 512). So the
rows stream SEQUENTIALLY from HBM — no sort, no permute — and each
block's segment sums are computed on the MXU as one-hot matmuls over the
band, accumulated into a VMEM-resident lane-packed output:

  1. the output span is covered by ``nwin`` statically-unrolled
     sub-windows of ``sub`` rows; per block only windows in the
     prefetched occupied range [a_lo, a_hi] execute (pl.when on a scalar
     compare), so MXU cost tracks the ACTUAL band, not the window bound;
  2. a (sub, BLK) one-hot contracted with the block's (BLK, C) rows
     computes a sub-window's partial sums in one matmul whose 0/1
     weights are exact in any dtype — bf16 cotangents ride a single MXU
     pass with f32 accumulation (strictly better numerics than the
     scatter's bf16 adds), f32 cotangents use the 3-pass HIGHEST
     decomposition. Built in VMEM the one-hot never exists in HBM (XLA
     would materialize ~4 GB of it at L0 bench shape);
  3. VMEM tiles are (8, 128), so a narrow C would waste lanes of the
     resident output — pk = 128 // c_blk consecutive virtual rows share
     one 128-lane packed row, and each slab is shifted by (base % pk)
     rows before a reshape so the accumulate lands on packed rows.

The caller (ops/gather.py) prepares per-block base rows and occupied
ranges; ``sorted_window_segsum`` keeps the sorted/compressed-rank variant
(one window, off relative to the block's base rank) on the same kernel.

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


def _kernel(base_ref, alo_ref, ahi_ref, off_ref, rows_ref, out_ref,
            *, sub, nwin, blk, pk, c_blk):
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)

    @pl.when(bi == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # NOTE (round 5): a masked-rows variant — off split as hi*sub + lo,
    # (sub, BLK) one-hot built ONCE per block from lo, rows zeroed per
    # window by the quotient mask (hi == a) on the much smaller
    # (BLK, c_blk) side — is ~5x fewer VPU element-ops on paper but
    # measured 20% SLOWER on v5e (L0 c=32: 23.6 vs 19.5 ms; c=66
    # batch-split: 27.5 vs 23.3): the per-window rows multiply
    # materializes a fresh MXU operand each window and breaks the
    # compare→matmul staging fusion the per-window one-hot enjoys.
    off = off_ref[0]      # (1, BLK) i32; -1 = dropped row
    rows = rows_ref[...]  # (BLK, c_blk) f32 or bf16
    precision = (
        jax.lax.Precision.HIGHEST
        if rows.dtype == jnp.float32
        # bf16 rows: one MXU pass — the 0/1 weights are exact in bf16 and
        # the products are exact bf16 values; accumulation is f32 (the
        # scatter path this replaces adds in bf16)
        else jax.lax.Precision.DEFAULT
    )
    base0 = base_ref[bi]
    a_lo = alo_ref[bi]
    a_hi = ahi_ref[bi]
    sp = sub // pk
    # constant per-lane-group iotas, hoisted out of the window loop (the
    # one-hot compare is the kernel's VPU bound — don't pay the *pk+g
    # arithmetic per window)
    iota = jax.lax.broadcasted_iota(jnp.int32, (sp, blk), 0)
    iotas = [iota * pk + g for g in range(pk)]

    def window(a):
        offa = off - a * sub  # (1, BLK), broadcasts against the iota
        # The resident output is lane-packed: virtual row v lives at
        # packed row v // pk, lane group v % pk. Mosaic supports neither
        # value-level dynamic_update_slice nor a (sub, c) → (sub/pk,
        # pk*c) sublane→lane fold, so the packed slab is produced
        # DIRECTLY: one dot per lane group g selecting rows with
        # offa % pk == g (iota*pk + g), concatenated along lanes. Same
        # total MXU work as one (sub, blk) dot. CONTRACT: base % pk == 0
        # (wrappers align bases to 8 ≥ pk).
        groups = []
        for g in range(pk):
            onehot = (iotas[g] == offa).astype(rows.dtype)
            groups.append(
                jax.lax.dot_general(
                    onehot,
                    rows,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )  # (sp, c_blk) f32
            )
        packed = groups[0] if pk == 1 else jnp.concatenate(groups, axis=1)
        p0 = (base0 + a * sub) // pk
        if pk == 1 and sub % 8 == 0:
            # wide chunks (c_blk > 128, multi-tile lanes) require a
            # PROVABLY 8-aligned sublane index; with pk == 1 it is one by
            # the 8-aligned-base contract (base0 + a*sub, sub % 8 == 0) —
            # the annotation is what makes Mosaic accept the accumulate
            p0 = pl.multiple_of(p0, 8)
        out_ref[pl.ds(p0, sp), :] = out_ref[pl.ds(p0, sp), :] + packed

    # always guarded: a fully-dropped block has a_hi < a_lo and must not
    # reach the accumulate (its base + a*sub would be out of range)
    for i in range(nwin):
        a = a_lo + i

        @pl.when(a <= a_hi)
        def _go(a=a):
            window(a)


def _pick_packing(c, sub, ndistinct, nwin, vmem_budget_bytes):
    """Choose (c_blk, pk, rows_p): lane-packed resident output layout.

    Prefers a SINGLE chunk — the smallest c_blk ≥ c that fits the budget
    (the VPU one-hot construction is the kernel's bound and is paid once
    per chunk, so lane padding beats chunking) — then falls back to
    multi-chunk with the widest fitting c_blk. pk is capped by
    divisibility of ``sub`` (slabs fold pk rows per packed row).

    The accumulate guard caps windows at a_hi ≤ (ns-1)//sub, so the
    resident only needs ``sub + pk`` rows of slack past ``ndistinct``
    (NOT nwin·sub — that over-allocation cost 24% VMEM at L0 scale).
    """
    # pk ≤ 8: wrappers align bases to 8, and sub must fold evenly
    max_pk = 1
    while max_pk < 8 and sub % (max_pk * 2) == 0:
        max_pk *= 2

    def fit(c_blk):
        pk = max(1, min(128 // c_blk, max_pk))
        rows_p = -(-(ndistinct + sub + pk) // pk)
        # VMEM tiles are (8, 128): blocks narrower than 128 lanes still
        # occupy 128 — budget with the padded width
        if rows_p * max(pk * c_blk, 128) * 4 <= vmem_budget_bytes:
            return c_blk, pk, rows_p
        return None

    # wide chunks (pk = 1, minor dims stay 128-divisible) keep the c=256+
    # decoder/upsample sites on the kernel instead of the scatter fallback
    for c_blk in (8, 16, 32, 64, 128, 256, 512, 1024):
        if c_blk >= c and fit(c_blk):  # single chunk, least pad first
            return fit(c_blk)
    for c_blk in (128, 64, 32, 16, 8):  # multi-chunk, widest fitting
        if c_blk <= c and fit(c_blk):
            return fit(c_blk)
    raise ValueError(
        f"no lane packing fits ndistinct={ndistinct} (+{sub} slack) "
        f"in {vmem_budget_bytes} bytes of VMEM"
    )


def _window_segsum(rows, off, base, a_lo, a_hi, ndistinct,
                   blk, sub, nwin, vmem_budget_bytes, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, c = rows.shape
    if r % blk:
        raise ValueError(f"rows count {r} not a multiple of blk={blk}")
    if sub % 8:
        raise ValueError(f"sub={sub} must be a multiple of 8")
    nblk = r // blk

    c_blk, pk, rows_p = _pick_packing(
        c, sub, ndistinct, nwin, vmem_budget_bytes
    )
    ndist_pad = rows_p * pk
    c_pad = (-c) % c_blk
    if c_pad:
        rows = jnp.pad(rows, ((0, 0), (0, c_pad)))
    c_chunks = (c + c_pad) // c_blk

    # channel chunks are sliced OUTSIDE the kernel: Mosaic requires a
    # block's minor dim to be 128-divisible or equal to the array dim, so
    # a (blk, c_blk<128) block over a multi-chunk array is rejected —
    # per-chunk calls see an array whose minor dim IS c_blk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[
            # offsets ride as (nblk, 1, blk): the last-two-dims rule sees
            # a (1, blk) block equal to the array's (1, blk) trailing
            # dims, and the kernel gets a native 2-D row vector (a 1-D
            # (blk,) block would need an unsupported 1-D→2-D shape cast
            # in-kernel to broadcast against the iota)
            pl.BlockSpec((1, 1, blk), lambda bi, b, al, ah: (bi, 0, 0)),
            pl.BlockSpec((blk, c_blk), lambda bi, b, al, ah: (bi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (rows_p, pk * c_blk), lambda bi, b, al, ah: (0, 0)
        ),
    )
    call = pl.pallas_call(
        functools.partial(
            _kernel, sub=sub, nwin=nwin, blk=blk, pk=pk, c_blk=c_blk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_p, pk * c_blk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    off3 = off.reshape(nblk, 1, blk)
    chunks = [
        call(
            base, a_lo, a_hi, off3, rows[:, j * c_blk:(j + 1) * c_blk]
        ).reshape(ndist_pad, c_blk)[:ndistinct]
        for j in range(c_chunks)
    ]
    return jnp.concatenate(chunks, axis=1)[:, :c] if c_chunks > 1 else (
        chunks[0][:, :c]
    )


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

    Returns:
      (ndistinct, C) f32: out[j] = Σ rows[i] over rows with compressed
      rank j. Exact (0/1 one-hot weights, f32 MXU accumulation).
    """
    if w < blk + 1 or w % 8:
        raise ValueError(f"w={w} must be >= blk+1 and a multiple of 8")
    # align each block's base rank to 8 (the _accum packing contract) by
    # folding the remainder into the offsets; widen the window to cover
    rem = rnk_lo % 8
    base = rnk_lo - rem
    off = off + jnp.repeat(rem, blk)
    zeros = jnp.zeros_like(rnk_lo)
    return _window_segsum(
        rows, off, base, zeros, zeros, ndistinct,
        blk=blk, sub=w + 8, nwin=1,
        vmem_budget_bytes=vmem_budget_bytes, interpret=interpret,
    )


def banded_window_segsum(
    rows: jnp.ndarray,
    off: jnp.ndarray,
    base: jnp.ndarray,
    a_lo: jnp.ndarray,
    a_hi: jnp.ndarray,
    ndistinct: int,
    nwin: int,
    blk: int = 512,
    sub: int = 512,
    vmem_budget_bytes: int = 10 * 1024 * 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum UNSORTED rows whose per-block targets are banded.

    Args:
      rows: (R, C) f32/bf16 cotangent rows in natural order (R % blk == 0,
        blocks must not straddle ``base`` boundaries — callers pad).
      off: (R,) int32 — target row RELATIVE to the block's base, or -1 to
        drop the row. Rows with off outside [a_lo*sub, (a_lo+nwin)*sub)
        are silently dropped — callers route them through a residual path.
      base: (R // blk,) int32 — virtual output row each block's offsets
        are relative to (e.g. batch_element * ns). MUST be 8-aligned
        (the _accum lane-packing contract).
      a_lo / a_hi: (R // blk,) int32 — first / last occupied sub-window
        per block (a_hi < a_lo ⇒ block fully dropped).
      ndistinct: number of output rows.
      nwin: static number of unrolled sub-windows per block.
      blk / sub: rows per block / rows per sub-window (sub % 8 == 0).

    Returns:
      (ndistinct, C) f32 segment sums. Exact for in-window rows (0/1
      one-hot weights; bf16 rows get exact products + f32 accumulation).
    """
    return _window_segsum(
        rows, off, base, a_lo, a_hi, ndistinct,
        blk=blk, sub=sub, nwin=nwin,
        vmem_budget_bytes=vmem_budget_bytes, interpret=interpret,
    )
