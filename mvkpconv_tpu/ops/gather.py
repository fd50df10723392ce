"""Gather ops.

TPU-native replacement for mvpnet/ops/cuda/group_points_kernel.cu (forward
gather + backward scatter-add) and KPConv-PyTorch/models/blocks.py:35-66
(``gather``). In JAX a gather is ``take_along_axis`` and its VJP is the
scatter-add automatically — no custom backward needed.

Layout note: the reference uses channels-first (B, C, N); we use
channels-last (..., N, C), the natural layout for TPU (last dim = lanes).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import warnings
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


_TRANSPOSE_MODES = ("scatter", "sorted", "window", "banded", "banded_bf16")

_TRANSPOSE_BLK = 512  # rows per cumsum block in the sorted transpose


#   'banded'  — NO-SORT windowed one-hot MXU segment sum exploiting the
#               pipeline's voxel-sorted point order (cotangent rows stream
#               sequentially; per-block target bands measured ~3.4k at L0,
#               scratch/prof_band.py). See _transpose_banded.
_BANDED_SUB = 512   # rows per one-hot sub-window
_BANDED_NWIN = 10   # statically unrolled sub-windows: covers bands up to
                    # (NWIN-1)*SUB+1 = 4609 targets; wider bands take the
                    # exact residual-scatter path


class GatherVJP(NamedTuple):
    """How the gather's VJP materializes d_features (static, hashable —
    captured per group_points CALL SITE at forward trace time, so two train
    steps traced under different scopes each keep their own mode; nothing
    is read back at backward-trace time).

    mode — measured on TPU v5e at the L0 bench shape (1.97M rows, 65k
    targets, C=32):
      'scatter' — jnp .at[].add, XLA's native take-transpose: 58M rows/s.
      'sorted'  — sort rows by target + permuted gather + blocked cumsum +
                  boundary diff: every stage runs at gather/VPU speed.
                  Exact up to f32 reassociation (accumulates in f32). The
                  backward scatter is 117.7 ms of the 119 ms train-step
                  backward (scratch/prof_scatter_share.py), which is why
                  this is switchable at all.
      'window' / 'banded' / 'banded_bf16' — MXU one-hot segment sums
                  (ops/pallas/segsum.py); see _transpose_window /
                  _transpose_banded.

    mesh/axis — when a banded* mode runs under a multi-device mesh, the
    Pallas kernel (a custom call with no GSPMD/Shardy partitioning rule)
    is wrapped in ``shard_map`` over the batch dim along ``axis``: the
    batch-split kernel calls are per-batch-element already, so each shard's
    rows/targets are self-contained and the transpose runs fully local —
    the +41% banded train win survives scale-out instead of silently
    falling back to scatter.
    """

    mode: str = "scatter"
    mesh: Optional[jax.sharding.Mesh] = None
    axis: str = "data"


_VJP_CONFIG: contextvars.ContextVar[GatherVJP] = contextvars.ContextVar(
    "gather_vjp_config", default=GatherVJP()
)


def set_gather_transpose(mode: str) -> None:
    """Set the process-default group_points VJP mode
    ('scatter' | 'sorted' | 'window' | 'banded' | 'banded_bf16').

    Captured per call site at FORWARD trace time — set it (or use the
    ``gather_transpose`` scope) before tracing; already-traced functions
    keep the mode they captured."""
    if mode not in _TRANSPOSE_MODES:
        raise ValueError(f"unknown gather transpose mode {mode!r}")
    _VJP_CONFIG.set(GatherVJP(mode=mode))


def get_gather_transpose() -> str:
    return _VJP_CONFIG.get().mode


@contextlib.contextmanager
def gather_transpose(mode: str, mesh=None, axis: str = "data"):
    """Scope the group_points VJP config for code traced within.

    ``make_train_step`` opens this scope inside the step body (i.e. at
    trace time), so each step's traced ops capture exactly its config —
    steps with different configs coexist in one process."""
    if mode not in _TRANSPOSE_MODES:
        raise ValueError(f"unknown gather transpose mode {mode!r}")
    token = _VJP_CONFIG.set(GatherVJP(mode=mode, mesh=mesh, axis=axis))
    try:
        yield
    finally:
        _VJP_CONFIG.reset(token)


def _gather_rows(features: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    batch_shape = index.shape[:-2]
    nq, k = index.shape[-2], index.shape[-1]
    ns, c = features.shape[-2], features.shape[-1]
    if batch_shape != features.shape[:-2]:
        raise ValueError(
            f"batch dims mismatch: features {features.shape} index {index.shape}"
        )
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    flat_feat = features.reshape(b * ns, c)
    out = jnp.take(flat_feat, flat_idx, axis=0)
    return out.reshape(batch_shape + (nq, k, c))


def group_points(features: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point features at neighbor indices.

    Args:
      features: (..., Ns, C) — supports features. If callers use shadow
        indices (== Ns) they must pass features padded with a zero row at Ns
        (see ``pad_shadow_row``).
      index: (..., Nq, K) int32 indices into the Ns axis.

    Returns:
      (..., Nq, K, C) gathered features. Differentiable (VJP = scatter-add
      or a segment-sum transpose; the ambient ``gather_transpose`` scope /
      ``set_gather_transpose`` default is captured statically per call
      site at forward trace time; all modes match
      group_points_kernel.cu's backward semantics).

    Perf note: the batch dims are folded into the row axis and gathered with
    a single flat ``jnp.take`` — measured 3× faster on TPU than the batched
    ``take_along_axis`` lowering (the gather is start-bound at ~340-440M
    starts/s in flat form, independent of payload and source size).
    """
    return _group_points(features, index, _VJP_CONFIG.get())


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _group_points(features, index, gcfg: GatherVJP):
    return _gather_rows(features, index)


def _group_points_fwd(features, index, gcfg):
    # zero-byte marker carrying Ns and the feature dtype statically
    # (residuals must be JAX types — shape tuples/dtypes are not)
    marker = jnp.zeros((features.shape[-2], 0), features.dtype)
    return _gather_rows(features, index), (index, marker)


def _transpose_scatter(ct, index, feat_shape):
    """XLA's native take-transpose: one flat scatter-add (ct dtype)."""
    batch_shape = index.shape[:-2]
    ns, c = feat_shape[-2], feat_shape[-1]
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    d = (
        jnp.zeros((b * ns, c), ct.dtype)
        .at[flat_idx].add(ct.reshape(-1, c))
    )
    return d.reshape(feat_shape)


def _transpose_sorted(ct, index, feat_shape):
    """Exact segment-sum transpose at gather speed.

    Sort the cotangent rows by target row id (stable pair sort), gather
    them into segment-contiguous order, then compute per-target sums as a
    boundary difference of a BLOCKED cumulative sum — a flat cumsum over
    millions of rows lowers catastrophically on TPU (85 ms at L0), but a
    (nblk, 512, C) axis-1 cumsum is 6 ms for the same elements. Segment
    boundaries come from a vectorized binary search over the sorted ids.
    Accumulation is f32 regardless of ct dtype.
    """
    batch_shape = index.shape[:-2]
    ns, c = feat_shape[-2], feat_shape[-1]
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    rows = ct.reshape(-1, c)
    n_rows = rows.shape[0]
    tgts = b * ns
    blk = _TRANSPOSE_BLK

    iota = jnp.arange(n_rows, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort(
        (flat_idx.astype(jnp.int32), iota), num_keys=1
    )
    srows = jnp.take(rows.astype(jnp.float32), perm, axis=0)
    # barriers: without them XLA fuses the take / the cumsum into one loop
    # fusion and re-evaluates producers per window position
    srows = jax.lax.optimization_barrier(srows)
    pad = (-n_rows) % blk
    if pad:
        srows = jnp.concatenate(
            [srows, jnp.zeros((pad, c), jnp.float32)], axis=0
        )
    nblk = srows.shape[0] // blk
    inner = jnp.cumsum(srows.reshape(nblk, blk, c), axis=1)
    inner = jax.lax.optimization_barrier(inner)
    btot = inner[:, -1, :]
    # exclusive block prefix with a final all-blocks entry (boundary at the
    # very end lands in the virtual block past the last)
    bpre = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32), jnp.cumsum(btot, axis=0)], axis=0
    )
    starts = jnp.searchsorted(
        sorted_idx, jnp.arange(tgts + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    inner_flat = inner.reshape(nblk * blk, c)
    in_blk = jnp.take(
        inner_flat, jnp.maximum(starts - 1, 0), axis=0
    ) * (starts % blk != 0).astype(jnp.float32)[:, None]
    cs = in_blk + jnp.take(bpre, starts // blk, axis=0)
    return (cs[1:] - cs[:-1]).reshape(feat_shape)


def _blocked_cumsum_1d(v: jnp.ndarray, blk: int) -> jnp.ndarray:
    """Inclusive cumsum over a long 1-D vector via (nblk, blk) blocks.

    A flat million-row cumsum lowers catastrophically on TPU (85 ms at L0
    bench rows); the same elements as an axis-1 cumsum over blk-wide
    blocks plus a tiny block-prefix run at VPU speed.
    """
    n = v.shape[0]
    pad = (-n) % blk
    vp = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)]) if pad else v
    nb = vp.shape[0] // blk
    inner = jnp.cumsum(vp.reshape(nb, blk), axis=1)
    bpre = jnp.concatenate(
        [jnp.zeros((1,), v.dtype), jnp.cumsum(inner[:, -1])]
    )[:-1]
    return (inner + bpre[:, None]).reshape(-1)[:n]


def _transpose_window(ct, index, feat_shape):
    """Sorted + compressed-rank windowed one-hot-matmul segment sum.

    Same sort/permute front end as ``_transpose_sorted``, but the segment
    reduction runs on the MXU inside a Pallas kernel
    (ops/pallas/segsum.py): each 512-row block's partial sums are one
    exact (W,512)×(512,C) one-hot matmul accumulated into a VMEM-resident
    output at the block's compressed-rank base. A final 65k-row remap
    expands compressed ranks back to target rows. Exact up to f32
    reassociation.
    """
    from mvkpconv_tpu.ops.pallas.segsum import (
        pallas_supported,
        sorted_window_segsum,
    )

    batch_shape = index.shape[:-2]
    ns, c = feat_shape[-2], feat_shape[-1]
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    rows = ct.reshape(-1, c).astype(jnp.float32)
    n_rows = rows.shape[0]
    tgts = b * ns
    blk = _TRANSPOSE_BLK

    iota = jnp.arange(n_rows, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort(
        (flat_idx.astype(jnp.int32), iota), num_keys=1
    )
    srows = jnp.take(rows, perm, axis=0)
    pad = (-n_rows) % blk
    if pad:
        # sentinel target `tgts`: one extra distinct slot, zero rows
        srows = jnp.concatenate([srows, jnp.zeros((pad, c), jnp.float32)])
        sorted_pad = jnp.concatenate(
            [sorted_idx, jnp.full((pad,), tgts, jnp.int32)]
        )
    else:
        sorted_pad = sorted_idx
    nblk = srows.shape[0] // blk

    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_pad[1:] != sorted_pad[:-1]).astype(jnp.int32)]
    )
    rnk = _blocked_cumsum_1d(is_new, blk) - 1
    rnk2 = rnk.reshape(nblk, blk)
    rnk_lo = rnk2[:, 0]
    off = (rnk2 - rnk_lo[:, None]).astype(jnp.int32)

    ndistinct = min(n_rows + 1, tgts + 1)
    compressed = sorted_window_segsum(
        srows, off.reshape(-1), rnk_lo, ndistinct,
        blk=blk, w=blk + 8, interpret=not pallas_supported(),
    )

    starts = jnp.searchsorted(
        sorted_idx, jnp.arange(tgts + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    nonempty = (starts[1:] != starts[:-1]).astype(jnp.int32)
    rank_of_t = _blocked_cumsum_1d(nonempty, blk) - 1
    out = jnp.take(compressed, jnp.maximum(rank_of_t, 0), axis=0)
    out = out * nonempty.astype(jnp.float32)[:, None]
    return out.reshape(feat_shape)


def _transpose_banded(ct, index, feat_shape, interpret=None):
    """No-sort banded one-hot-matmul segment sum (the production fast path).

    Every sort-based transpose is doomed by the permuted take of the
    cotangent rows — a random HBM access per row from a multi-hundred-MB
    source, measured 74.85 ms at the L0 bench shape vs 6.6 ms for a
    sequential read (scratch/prof_scatter4.py). But the data pipeline
    emits voxel-x-major-sorted points, so in NATURAL row order a 512-row
    cotangent block's targets live in a bounded band (p99 3.4k of 16.4k
    targets at L0, scratch/prof_band.py). This transpose therefore:

      * streams the rows sequentially (no sort, no permute), padded per
        batch element so blocks never straddle batch boundaries;
      * computes each block's segment sums on the MXU as one-hot matmuls
        over the occupied sub-windows of its band, accumulated into a
        VMEM-resident lane-packed output (ops/pallas/segsum.py) — MXU
        cost tracks the actual band via per-block occupied-range
        prefetch;
      * drops rows targeting the LAST source row (the shadow row of
        ``pad_shadow_row`` callers) in-kernel and recovers their exact
        sum with one masked reduction — shadow targets sit at the END of
        each batch segment, far outside the band;
      * routes the rare rows beyond the static window budget
        (band > (NWIN-1)*SUB+1, e.g. across z-order discontinuities)
        through an exact compact-then-scatter residual, with a full
        masked scatter fallback under lax.cond if the static residual
        capacity ever overflows — exactness never depends on the band
        assumption.

    bf16 cotangents ride a single MXU pass with f32 accumulation —
    strictly better numerics than the scatter's bf16 adds; f32 cotangents
    use the 3-pass HIGHEST decomposition (exact products either way: the
    one-hot weights are 0/1).
    """
    from mvkpconv_tpu.ops.pallas.segsum import (
        _pick_packing,
        banded_window_segsum,
        pallas_supported,
    )

    batch_shape = index.shape[:-2]
    ns, c = feat_shape[-2], feat_shape[-1]
    nq, k = index.shape[-2], index.shape[-1]
    b = 1
    for d in batch_shape:
        b *= d
    blk = _TRANSPOSE_BLK
    sub = _BANDED_SUB
    rpb = nq * k
    rpb_pad = -(-rpb // blk) * blk
    nsub_full = -(-ns // sub)
    nwin = min(nsub_full, _BANDED_NWIN)

    # Per-site policy (measured on v5e, scratch/prof_banded_parts.py): the
    # kernel wins when the channels fit ONE chunk (c=32 at the 1.97M-row
    # L0 site: 19.3 ms kernel vs 42.3 ms scatter); multi-chunk sites repeat
    # the VPU one-hot construction per chunk and LOSE (c=66: 56.1 vs
    # 35.9 ms). If the GLOBAL resident doesn't allow a single chunk, try
    # per-batch-element calls (ndistinct shrinks b×, so e.g. the L0
    # c=66 and pool c=128 sites become single-chunk with a padded
    # 128-lane resident); only then fall back to the scatter.
    ns8 = -(-ns // 8) * 8
    budget = 10 * 1024 * 1024
    batch_split = False
    try:
        c_blk, _pk, _rows_p = _pick_packing(c, sub, b * ns8, nwin, budget)
    except ValueError:
        c_blk = 0
    if c_blk < c:  # global packing would chunk (or not fit at all)
        try:
            c_blk, _pk, _rows_p = _pick_packing(c, sub, ns8, nwin, budget)
        except ValueError:
            c_blk = 0
        if c_blk >= c and b > 1:
            batch_split = True
        else:
            return _transpose_scatter(ct, index, feat_shape)

    rows = ct.reshape(b, rpb, c)
    if rows.dtype != jnp.bfloat16:
        rows = rows.astype(jnp.float32)
    # barrier: the transpose reads the cotangent from THREE consumers
    # (kernel, shadow reduce, residual flags) — without it XLA fuses the
    # ct producer (an einsum backward in-model) into each consumer and
    # recomputes it per consumer (same pathology _transpose_sorted hit)
    rows = jax.lax.optimization_barrier(rows)
    idxb = index.reshape(b, rpb).astype(jnp.int32)
    pad = rpb_pad - rpb
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
        # pad rows carry zero cotangents; aim them at the shadow slot
        idxb = jnp.pad(idxb, ((0, 0), (0, pad)), constant_values=ns - 1)
    shadow = idxb == ns - 1
    off = jnp.where(shadow, -1, idxb)  # (b, rpb_pad) i32, -1 = dropped

    nblk_b = rpb_pad // blk
    nblk = b * nblk_b
    n_rows = nblk * blk
    offb = off.reshape(nblk, blk)
    big = jnp.int32(1 << 20)
    a_lo = jnp.min(jnp.where(offb < 0, big, offb), axis=1) // sub
    a_hi = jnp.max(offb, axis=1) // sub  # all-dropped block: -1 < a_lo
    # kernel bases must be 8-aligned (lane-packing contract): batch
    # elements stride by ns rounded up to 8 in the kernel's virtual
    # output; the pad rows are sliced off after the reshape below
    base = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32) * ns8, nblk_b
    )

    rows_flat = rows.reshape(n_rows, c)
    interp = (not pallas_supported()) if interpret is None else interpret
    a_lo = a_lo.astype(jnp.int32)
    a_hi = a_hi.astype(jnp.int32)
    if batch_split:
        # per-batch-element calls: base is 0 (offsets are already
        # per-batch indices), the resident shrinks b× so the channels
        # fit one padded chunk and the one-hot is built once for all of
        # them. Totals (rows streamed, one-hot compares, MXU) are
        # unchanged — only the grid is cut into b pieces.
        zeros_b = jnp.zeros((nblk_b,), jnp.int32)
        pieces = [
            banded_window_segsum(
                rows_flat[i * rpb_pad:(i + 1) * rpb_pad],
                off[i].reshape(-1), zeros_b,
                a_lo[i * nblk_b:(i + 1) * nblk_b],
                a_hi[i * nblk_b:(i + 1) * nblk_b],
                ns8, nwin=nwin, blk=blk, sub=sub, interpret=interp,
            )
            for i in range(b)
        ]
        out = jnp.stack(pieces).reshape(b * ns8, c)
    else:
        out = banded_window_segsum(
            rows_flat, off.reshape(-1), base,
            a_lo, a_hi,
            b * ns8, nwin=nwin, blk=blk, sub=sub, interpret=interp,
        )

    # exact shadow-row recovery: one masked reduction per batch element
    # (the cast fuses into the einsum; no f32 copy of the rows exists)
    sh = jnp.einsum(
        "brc,br->bc",
        rows.astype(jnp.float32),
        shadow.astype(jnp.float32),
    )
    out = out.reshape(b, ns8, c)[:, :ns].at[:, ns - 1, :].add(sh)

    if nsub_full > nwin:
        # residual: rows beyond the per-block window budget (measured 0 at
        # bench shapes, a real-data safety net). The whole machinery —
        # searchsorted compaction, takes, scatter — sits inside a cond on
        # total==0 so the typical step pays only the blocked count cumsum.
        cov = (a_lo + nwin) * sub  # (nblk,) first uncovered target
        flags = (offb >= cov[:, None]).reshape(-1)  # off=-1 never >= cov
        # the common (no-residual) step pays only this flat reduction; the
        # row-position cumsum happens INSIDE the taken branch (a closure
        # value would be a cond operand, computed even when total == 0)
        total = jnp.sum(flags.astype(jnp.int32))
        max_out = max(1024, n_rows // 512)
        dump = b * ns

        def residual(_):
            # residual targets live in the UNPADDED (b*ns) space, not the
            # kernel's 8-aligned virtual rows
            base_row = jnp.repeat(
                jnp.arange(b, dtype=jnp.int32) * ns, rpb_pad
            )
            tgt_all = base_row + off.reshape(-1)

            def compact(_):
                pos = _blocked_cumsum_1d(flags.astype(jnp.int32), blk)
                slots = jnp.arange(max_out, dtype=jnp.int32) + 1
                oi = jnp.searchsorted(
                    pos, slots, side="left"
                ).astype(jnp.int32)
                valid = oi < n_rows
                oi = jnp.minimum(oi, n_rows - 1)
                res_rows = (
                    jnp.take(rows_flat, oi, axis=0).astype(jnp.float32)
                    * valid[:, None]
                )
                res_tgt = jnp.where(valid, jnp.take(tgt_all, oi), dump)
                return (
                    jnp.zeros((b * ns + 1, c), jnp.float32)
                    .at[res_tgt].add(res_rows)
                )

            def fallback(_):
                masked = jnp.where(
                    flags[:, None], rows_flat.astype(jnp.float32), 0.0
                )
                tgt = jnp.where(flags, tgt_all, dump)
                return (
                    jnp.zeros((b * ns + 1, c), jnp.float32)
                    .at[tgt].add(masked)
                )

            delta = jax.lax.cond(total <= max_out, compact, fallback, 0)
            return out + delta[:-1].reshape(b, ns, c)

        out = jax.lax.cond(total == 0, lambda _: out, residual, 0)

    return out.reshape(feat_shape)


def _transpose_banded_sharded(ct, index, feat_shape, mesh, axis):
    """Run the banded transpose fully shard-local over the batch dim.

    The banded Pallas kernel is a custom call GSPMD/Shardy cannot
    partition; unwrapped, a multi-device mesh would replicate its operands
    (an all-gather of every cotangent row). But _transpose_banded is
    per-batch-element by construction (the batch-split path literally
    calls the kernel once per element), so under ``shard_map`` over the
    batch dim each shard owns complete (rows, targets) segments and the
    transpose needs no communication at all. Returns None when the batch
    dim cannot shard over the axis (caller falls back to scatter).
    """
    n = mesh.shape.get(axis, 1)
    batch_shape = index.shape[:-2]
    if n <= 1:
        return _transpose_banded(ct, index, feat_shape)
    if not batch_shape or batch_shape[0] % n != 0:
        return None
    ns, c = feat_shape[-2], feat_shape[-1]
    # interpret must follow the MESH devices' platform, not the process
    # default backend (a CPU dryrun mesh can coexist with a TPU default)
    interp = mesh.devices.flat[0].platform not in ("tpu", "axon")

    def body(ct_l, idx_l):
        fs = idx_l.shape[:-2] + (ns, c)
        return _transpose_banded(ct_l, idx_l, fs, interpret=interp)

    spec = P(axis)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )(ct, index)


def _group_points_bwd(gcfg, res, ct):
    index, marker = res
    mode = gcfg.mode
    feat_shape = index.shape[:-2] + (marker.shape[0], ct.shape[-1])
    if mode == "sorted":
        d_feat = _transpose_sorted(ct, index, feat_shape)
    elif mode == "window":
        d_feat = _transpose_window(ct, index, feat_shape)
    elif mode in ("banded", "banded_bf16"):
        if mode == "banded_bf16" and ct.dtype != jnp.bfloat16:
            # quality-for-speed knob: quantize the cotangent rows to bf16
            # so the kernel's one-hot dot runs ONE MXU pass instead of the
            # 3-pass f32 decomposition (59 vs 19 ms at the L0 c=32 site).
            # In-model the feature CARRIERS are f32 (blocks.py casts the
            # payload to the positions' dtype), so this injects 2^-9-
            # relative rounding into per-row gradient terms the model
            # computed at bf16 precision anyway; accumulation stays f32.
            ct = ct.astype(jnp.bfloat16)
        if gcfg.mesh is not None:
            d_feat = _transpose_banded_sharded(
                ct, index, feat_shape, gcfg.mesh, gcfg.axis
            )
            if d_feat is None:
                warnings.warn(
                    f"banded gather transpose: batch dim "
                    f"{index.shape[:-2]} does not shard over mesh axis "
                    f"{gcfg.axis!r}={gcfg.mesh.shape.get(gcfg.axis)}; "
                    "falling back to the scatter transpose"
                )
                d_feat = _transpose_scatter(ct, index, feat_shape)
        else:
            d_feat = _transpose_banded(ct, index, feat_shape)
    else:
        d_feat = _transpose_scatter(ct, index, feat_shape)
    d_index = np.zeros(index.shape, dtype=jax.dtypes.float0)
    return d_feat.astype(marker.dtype), d_index


_group_points.defvjp(_group_points_fwd, _group_points_bwd)


def _flatten_index(index, batch_shape, ns):
    """Fold batch dims into a flat row index (the flat-take form)."""
    b = 1
    for d in batch_shape:
        b *= d
    row_base = (jnp.arange(b, dtype=index.dtype) * ns).reshape(
        (b,) + (1,) * (index.ndim - len(batch_shape))
    )
    flat = index.reshape((b,) + index.shape[len(batch_shape):]) + row_base
    return flat.reshape(-1), b


@jax.custom_vjp
def group_points_packed(xyz: jnp.ndarray, feat: jnp.ndarray,
                        index: jnp.ndarray):
    """Fused position⊕feature gather with the bf16 features PACKED into
    f32 lanes, so both ride ONE flat take from a half-size source.

    Motivation (measured, scratch/prof_lift_gather.py): gather start rate
    is source-BYTE-sensitive at large sources — 197k starts from a
    (384k, 67) f32 source run at 65M starts/s but at 144M from the same
    source in bf16. The 2D→3D lift gathers [xyz (f32, exactness required
    for the relation features) ⊕ 64 bf16 UNet channels]; bitcasting the
    bf16 pairs into 32 f32 lanes keeps xyz exact while shrinking the
    source from 103 MB to 54 MB — numerically EXACT on both parts (the
    features are bf16 upstream and downstream either way).

    Args:
      xyz:  (..., Ns, 3) float32.
      feat: (..., Ns, C) bfloat16, C even.
      index: (..., Nq, K) int32 into Ns — must be valid rows (the pixel
        kNN guarantees in-bounds indices; no shadow contract here).

    Returns:
      (gathered_xyz (..., Nq, K, 3) f32, gathered_feat (..., Nq, K, C)
      bf16). Differentiable in xyz and feat (custom VJP: two scatter-adds
      — `lax.bitcast_convert_type` has no autodiff rule, hence the
      custom_vjp rather than relying on XLA).
    """
    out, _ = _group_points_packed_fwd(xyz, feat, index)
    return out


def _group_points_packed_fwd(xyz, feat, index):
    if feat.dtype != jnp.bfloat16 or xyz.dtype != jnp.float32:
        raise ValueError(f"need f32 xyz + bf16 feat, got {xyz.dtype}/{feat.dtype}")
    c = feat.shape[-1]
    if c % 2:
        raise ValueError(f"feature channels must be even to pack, got {c}")
    batch_shape = index.shape[:-2]
    nq, k = index.shape[-2], index.shape[-1]
    ns = xyz.shape[-2]
    packed = jax.lax.bitcast_convert_type(
        feat.reshape(feat.shape[:-1] + (c // 2, 2)), jnp.float32
    )  # (..., Ns, C//2) f32 carrying bf16 pairs
    payload = jnp.concatenate([xyz, packed], axis=-1)  # (..., Ns, 3 + C//2)
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    rows = jnp.take(payload.reshape(b * ns, 3 + c // 2), flat_idx, axis=0)
    rows = rows.reshape(batch_shape + (nq, k, 3 + c // 2))
    g_xyz = rows[..., :3]
    g_feat = jax.lax.bitcast_convert_type(
        rows[..., 3:], jnp.bfloat16
    ).reshape(batch_shape + (nq, k, c))
    return (g_xyz, g_feat), (index, batch_shape, ns, c)


def _group_points_packed_bwd(res, cts):
    index, batch_shape, ns, c = res
    ct_xyz, ct_feat = cts
    flat_idx, b = _flatten_index(index, batch_shape, ns)
    d_xyz = (
        jnp.zeros((b * ns, 3), ct_xyz.dtype)
        .at[flat_idx].add(ct_xyz.reshape(-1, 3))
        .reshape(batch_shape + (ns, 3))
    )
    ctf = ct_feat.astype(jnp.float32)
    d_feat = (
        jnp.zeros((b * ns, c), jnp.float32)
        .at[flat_idx].add(ctf.reshape(-1, c))
        .reshape(batch_shape + (ns, c))
        .astype(jnp.bfloat16)
    )
    d_index = np.zeros(index.shape, dtype=jax.dtypes.float0)
    return d_xyz, d_feat, d_index


group_points_packed.defvjp(
    lambda xyz, feat, index: _group_points_packed_fwd(xyz, feat, index),
    _group_points_packed_bwd,
)


def pad_shadow_row(features: jnp.ndarray) -> jnp.ndarray:
    """Append a zero feature row so shadow index Ns selects zeros.

    Mirrors blocks.py:357 (``x = cat((x, zeros_like(x[:1])))``).
    """
    pad = [(0, 0)] * features.ndim
    pad[-2] = (0, 1)
    return jnp.pad(features, pad)


def batch_index_select(values: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Select rows of (..., N, C) by (..., M) indices → (..., M, C).

    Replacement for common/nn/functional.py:127-150 ``batch_index_select``.
    """
    return jnp.take_along_axis(values, index[..., None], axis=-2)
