"""Fused radius-top-k selection (Pallas): the pyramid's neighbor engine.

Replaces the ``pairwise_sq_dists`` + ``lax.approx_min_k`` pipeline for the
input-pyramid neighbor searches (the TPU-native counterpart of the
reference's per-cloud nanoflann radius search,
KPConv-PyTorch/cpp_wrappers/cpp_neighbors/neighbors.cpp:211-332). Measured
on v5e at the level-0 bench shape (4×16384 queries × 16384 supports, k=30):
2.9 ms vs 15.4 ms for the XLA approx path, at equal-or-better recall
(0.978 vs ~0.95-0.99 per-neighbor).

Design (one kernel, grid = (B, Nq/TQ)):
  * the support set rides along VMEM-resident and PRE-TRANSPOSED (3, Ns),
    so squared distances are computed in the numerically exact DIFFERENCE
    form — three broadcasted (TQ,1)−(1,TS) FMA passes on the VPU, full
    128-lane utilization, no distance-expansion cancellation and no MXU;
  * per support chunk, candidates fold into 128 per-lane "bins"; each lane
    keeps its champion via a single ``min`` because the candidate's index
    is PACKED into the 14 mantissa LSBs of the f32 distance — float order
    becomes (quantized-d2, index) lexicographic, so value and index travel
    in one register. Packed distances are clamped to the smallest normal
    float: packing an index into the mantissa of 0.0 would create a
    denormal that the VPU flushes to zero, destroying the index (this bit
    every self-distance);
  * chunks whose sorted-x range cannot overlap the query tile's
    [min−r, max+r] window are skipped (``lax.cond``). Pyramid levels are
    voxel-id-sorted (x-major) by construction — ``grid_subsample`` emits
    them that way — so a query tile of consecutive points is a thin x-slab
    and typically only ~2 of 16 chunks compute. Unsorted inputs stay
    CORRECT (the skip just never fires);
  * the final top-k extraction runs k rounds of (min, remove) over the 128
    packed champions — cheap because it is one array, not (value, index)
    pairs. Output is ascending by the 2⁻⁹-quantized distance keys (index
    tiebreak) with shadow index == Ns for missing neighbors, matching
    ``radius_neighbors``' contract (neighbors.cpp:319-325 shadow
    convention; near-ties within ~0.2% relative distance can reorder, so
    tie-sensitive consumers must not rely on strict ordering —
    ``closest_pool`` only needs the first entry to be a near-1-NN).

Recall model: k nearest among 128 bins loses only bin collisions among the
true top-k (~0.97-0.98 measured at k=30 on scan-like clouds) — the same
regime the reference's own calibrated-truncation operates in.

Limits: Ns (after padding to the chunk size) ≤ 2^IDX_BITS = 16384 with the
default 14 index bits (relative distance quantization 2⁻⁹); callers fall
back to the XLA path beyond that. k ≤ 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops.common import SHADOW_COORD

NBINS = 128
IDX_BITS = 14


def pallas_supported() -> bool:
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon")


def _kernel(q_ref, st_ref, out_ref, *, r2, r, k, ts, tq, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns_pad = st_ref.shape[-1]
    q = q_ref[0]  # (TQ, 3)
    qx = q[:, 0]
    qlo = jnp.min(qx) - r
    qhi = jnp.max(qx) + r
    nchunks = ns_pad // ts
    qc = [q[:, d:d + 1] for d in range(3)]
    mask_hi = jnp.int32(-1 << IDX_BITS)

    def bitcast(x, dt):
        if interpret:
            return jax.lax.bitcast_convert_type(x, dt)
        return pltpu.bitcast(x, dt)

    def body(c, cv):
        st = st_ref[0, :, pl.ds(c * ts, ts)]  # (3, TS)
        sx = st[0:1, :]

        def compute(cv):
            d2 = jnp.zeros((tq, ts), jnp.float32)
            for d in range(3):
                diff = qc[d] - st[d:d + 1, :]
                d2 = d2 + diff * diff
            idx = c * ts + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
            d2n = jnp.maximum(d2, jnp.float32(1.2e-38))  # no denormals
            packed = bitcast(
                (bitcast(d2n, jnp.int32) & mask_hi) | idx, jnp.float32
            )
            packed = jnp.where(d2 < r2, packed, jnp.inf)
            for j in range(ts // NBINS):
                cv = jnp.minimum(cv, packed[:, j * NBINS:(j + 1) * NBINS])
            return cv

        overlap = jnp.logical_and(jnp.min(sx) <= qhi, jnp.max(sx) >= qlo)
        return jax.lax.cond(overlap, compute, lambda v: v, cv)

    cv = jax.lax.fori_loop(
        0, nchunks, body, jnp.full((tq, NBINS), jnp.inf, jnp.float32)
    )

    outs = []
    for _ in range(k):
        m = jnp.min(cv, axis=1, keepdims=True)
        outs.append(m[:, 0])
        cv = jnp.where(cv == m, jnp.inf, cv)
    out_ref[0] = jnp.stack(outs, axis=1)


def binmin_radius_topk(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    k: int,
    tile_q: int = 256,
    tile_s: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Up-to-k nearest supports within ``radius``, shadow-padded, sorted.

    Args:
      query: (B, Nq, 3) float32; support: (B, Ns, 3) float32 (shadow-padded
        rows at SHADOW_COORD are fine — they are outside every radius).
      radius, k: search ball and neighbor budget (k ≤ 128).
      interpret: run the kernel in interpreter mode (CPU tests).

    Returns:
      (B, Nq, k) int32, entries == Ns mean "no neighbor", ascending by
      2⁻⁹-quantized distance (near-ties can reorder) — otherwise the same
      contract as :func:`ops.neighbors.radius_neighbors`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nq, _ = query.shape
    ns = support.shape[1]
    if k > NBINS:
        raise ValueError(f"k={k} exceeds the {NBINS}-bin champion buffer")

    tq = min(tile_q, nq)
    q_pad = (-nq) % tq
    if q_pad:
        # pad with copies of the last row (keeps the tile's x-window tight
        # so chunk skipping still fires); padded rows are sliced off below
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[:, -1:], (b, q_pad, 3))], axis=1
        )
    # chunk size must be a multiple of NBINS (the per-chunk merge walks
    # NBINS-wide slices); supports pad up to it with shadow rows
    ts = min(tile_s, -(-ns // NBINS) * NBINS)
    s_pad = (-ns) % ts
    if s_pad:
        query_dtype = support.dtype
        pad = jnp.full((b, s_pad, 3), SHADOW_COORD, query_dtype)
        support = jnp.concatenate([support, pad], axis=1)
    ns_pad = ns + s_pad
    if ns_pad > (1 << IDX_BITS):
        raise ValueError(
            f"support count {ns_pad} exceeds 2^{IDX_BITS}; use the XLA path"
        )

    st = jnp.transpose(support.astype(jnp.float32), (0, 2, 1))  # (B, 3, Ns)
    grid = (b, (nq + q_pad) // tq)
    packed = pl.pallas_call(
        functools.partial(
            _kernel, r2=float(radius) ** 2, r=float(radius), k=k, ts=ts,
            tq=tq, interpret=interpret,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, 3), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ns_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, k), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq + q_pad, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(query.astype(jnp.float32), st)
    if q_pad:
        packed = packed[:, :nq]
    bits = jax.lax.bitcast_convert_type(packed, jnp.int32)
    idx = bits & ((1 << IDX_BITS) - 1)
    idx = jnp.where(jnp.isfinite(packed), idx, ns)
    # shadow QUERY rows (coord SHADOW_COORD) sit at distance 0 from the
    # kernel's shadow-padded support rows, so they can legitimately select
    # pad slots >= ns — clamp those to the shadow index (real supports can
    # never select a pad row: it is outside every radius)
    return jnp.minimum(idx, ns).astype(jnp.int32)
