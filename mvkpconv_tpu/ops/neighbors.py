"""Neighbor-search ops (kNN, ball query, radius neighbors).

TPU-native replacements for:
  * mvpnet/ops/cuda/knn_distance_kernel.cu   (tiled brute-force top-K)
  * mvpnet/ops/cuda/ball_query_kernel.cu     (first-K-within-radius)
  * KPConv-PyTorch/cpp_wrappers/cpp_neighbors/neighbors.cpp
    (batch_nanoflann_neighbors: per-cloud KD-tree radius search)

Instead of KD-trees / hand-written CUDA we compute brute-force distance
matrices — the cross term is a matmul that rides the MXU, and query chunking
bounds peak memory. For the point counts in this workload (≤ tens of
thousands per cloud) this is faster on TPU than any tree could be.

Semantics match the reference exactly (pinned by its numpy test oracles,
mvpnet/ops/tests/*):
  * ``knn``: exact top-k by squared distance, ascending.
  * ``ball_query``: first ``k`` support indices (in index order) with
    d² < radius²; short rows padded by repeating the first found index.
  * ``radius_neighbors``: up to ``k`` nearest supports with d² < radius²,
    sorted by distance; missing slots padded with the shadow index
    ``num_support`` (neighbors.cpp:319-325 convention).

Selection method: ``lax.top_k`` lowers to a full per-row sort on TPU —
~1 s for a 16k×16k k=30 selection. ``method='approx'`` switches to
``lax.approx_min_k``, the TPU-native partial top-k (17× faster, recall
~0.95 per neighbor, still distance-sorted). Approximate selection is safe
wherever the reference itself truncates neighbor lists to calibrated
percentile budgets (conv/pool neighbors — KPConv sums influence weights, so
occasionally dropping the farthest in-radius neighbor is noise); exact
remains the default and is used for 1-NN upsampling and the oracle-tested
public ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops.common import chunked_over_queries, pairwise_sq_dists, pick_chunk


def _maybe_vmap(core, query, support, *args):
    """Dispatch (N,3) or (B,N,3) inputs to an unbatched core fn."""
    if query.ndim == 2:
        return core(query, support, *args)
    if query.ndim == 3:
        return jax.vmap(lambda q, s: core(q, s, *args))(query, support)
    raise ValueError(f"expected rank 2 or 3 points, got {query.ndim}")


def _pad_k(idx, aux, k: int, fill_idx: int, fill_aux):
    """Pad the trailing neighbor axis from min(k, Ns) up to k."""
    short = k - idx.shape[-1]
    if short <= 0:
        return idx, aux
    pad = [(0, 0)] * (idx.ndim - 1) + [(0, short)]
    idx = jnp.pad(idx, pad, constant_values=fill_idx)
    aux = jnp.pad(aux, pad, constant_values=fill_aux)
    return idx, aux


def _smallest_k(d2: jnp.ndarray, k: int, method: str):
    """Indices+values of the k smallest entries per row, ascending."""
    if k == 1:  # argmin — no sort, exact, fastest for 1-NN upsampling
        idx = jnp.argmin(d2, axis=-1, keepdims=True).astype(jnp.int32)
        return idx, jnp.take_along_axis(d2, idx, axis=-1)
    if method == "approx":
        # recall_target 0.9 halves the PartialReduce cost vs the 0.95
        # default (45.9 → 23.5 ms at 82k×16k rows) while measured recall on
        # scan-like clouds only drops 0.995 → 0.989 — well inside the
        # calibrated-truncation tolerance the reference itself applies.
        vals, idx = jax.lax.approx_min_k(d2, k, recall_target=0.9)
        return idx.astype(jnp.int32), vals
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


def _knn_core(query: jnp.ndarray, support: jnp.ndarray, k: int, method: str):
    ns = support.shape[0]
    chunk = pick_chunk(query.shape[0], ns)
    keff = min(k, ns)

    def per_chunk(q):
        d2 = pairwise_sq_dists(q, support)  # (chunk, Ns)
        idx, vals = _smallest_k(d2, keff, method)
        return _pad_k(idx, vals, k, ns - 1, jnp.inf)

    return chunked_over_queries(per_chunk, query, chunk)


def knn(query: jnp.ndarray, support: jnp.ndarray, k: int, method: str = "exact"):
    """k-nearest-neighbors with squared distances.

    Args:
      query: (..., Nq, 3); support: (..., Ns, 3). Padded (shadow) support
        points are naturally never nearest as long as Ns_valid >= k.
      k: number of neighbors.
      method: 'exact' (top_k sort) or 'approx' (TPU approx_min_k).

    Returns:
      (idx, sqdist): (..., Nq, k) int32 indices ascending by distance and
      (..., Nq, k) float32 squared distances.
    """
    return _maybe_vmap(
        functools.partial(_knn_core, k=k, method=method), query, support
    )


def _radius_core(query, support, radius: float, k: int, method: str):
    ns = support.shape[0]
    chunk = pick_chunk(query.shape[0], ns)
    r2 = jnp.float32(radius) ** 2

    keff = min(k, ns)

    def per_chunk(q):
        d2 = pairwise_sq_dists(q, support)  # (chunk, Ns)
        d2 = jnp.where(d2 < r2, d2, jnp.inf)
        # (bf16 storage of the f32-computed d² before the selection was
        # measured and is NOT faster: approx_min_k is row-bound, not
        # byte-bound — see RESULTS.md. Keep exact f32 values.)
        idx, vals = _smallest_k(d2, keff, method)
        idx = jnp.where(jnp.isfinite(vals), idx, ns)
        idx, _ = _pad_k(idx, vals, k, ns, jnp.inf)
        return idx

    return chunked_over_queries(per_chunk, query, chunk)


def _pool_up_core(sub, p, radius: float, k: int, up_radius: float, method: str):
    """Pool neighbors (sub→p) and upsample 1-NN (p→sub) from ONE distance
    sweep: the pool matrix d²(sub, p) is exactly the transpose of what the
    upsample needs, so the 1-NN per level-l point is the column argmin —
    a reduction over the rows already being computed, instead of a second
    full pairwise pass."""
    np_ = p.shape[0]
    nsub = sub.shape[0]
    chunk = pick_chunk(nsub, np_)
    r2 = jnp.float32(radius) ** 2
    keff = min(k, np_)

    def per_chunk(q):
        d2 = pairwise_sq_dists(q, p)  # (chunk, Np)
        masked = jnp.where(d2 < r2, d2, jnp.inf)
        idx, vals = _smallest_k(masked, keff, method)
        idx = jnp.where(jnp.isfinite(vals), idx, np_)
        idx, _ = _pad_k(idx, vals, k, np_, jnp.inf)
        # column minima for the upsample (within this row chunk)
        col_arg = jnp.argmin(d2, axis=0).astype(jnp.int32)  # (Np,)
        col_min = jnp.take_along_axis(d2, col_arg[None], axis=0)[0]
        return idx, col_min, col_arg

    if nsub <= chunk:
        pool_idx, col_min, col_arg = per_chunk(sub)
        up = col_arg
        up_d2 = col_min
    else:
        assert nsub % chunk == 0
        chunks = sub.reshape(nsub // chunk, chunk, 3)
        pool_idx, col_mins, col_args = jax.lax.map(per_chunk, chunks)
        pool_idx = pool_idx.reshape(nsub, -1)
        best_chunk = jnp.argmin(col_mins, axis=0)  # (Np,)
        up_d2 = jnp.take_along_axis(col_mins, best_chunk[None], axis=0)[0]
        local = jnp.take_along_axis(col_args, best_chunk[None], axis=0)[0]
        up = (best_chunk.astype(jnp.int32) * chunk + local).astype(jnp.int32)
    up = jnp.where(up_d2 <= jnp.float32(up_radius) ** 2, up, nsub)
    return pool_idx, up[:, None].astype(jnp.int32)


def pool_and_upsample(
    sub: jnp.ndarray,
    p: jnp.ndarray,
    radius: float,
    k: int,
    up_radius: float,
    method: str = "exact",
):
    """Fused pool-neighbor + upsample-1-NN selection for one pyramid level.

    Args:
      sub: (..., Nsub, 3) level-(l+1) points (pool queries / upsample
        supports); p: (..., Np, 3) level-l points.
      radius, k: pool search ball and budget; up_radius: upsample cutoff
        (2× the pool radius, common.py:608-610).

    Returns:
      (pool_idx (..., Nsub, k) shadow=Np, up_idx (..., Np, 1) shadow=Nsub).
    """
    return _maybe_vmap(
        functools.partial(
            _pool_up_core, radius=radius, k=k, up_radius=up_radius,
            method=method,
        ),
        sub,
        p,
    )


def radius_neighbors(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    k: int,
    method: str = "exact",
):
    """Up-to-k nearest neighbors within ``radius``, shadow-padded.

    Returns (..., Nq, k) int32; entries equal to Ns mean "no neighbor" and
    must be routed to a zero shadow feature row by consumers (the KPConv op
    and pooling blocks do this). Matches the reference's calibrated
    ``neighborhood_limits`` truncation of the C++ radius search.
    """
    return _maybe_vmap(
        functools.partial(_radius_core, radius=radius, k=k, method=method),
        query,
        support,
    )


def _ball_core(query, support, radius: float, k: int):
    ns = support.shape[0]
    chunk = pick_chunk(query.shape[0], ns)
    r2 = jnp.float32(radius) ** 2

    keff = min(k, ns)

    def per_chunk(q):
        d2 = pairwise_sq_dists(q, support)  # (chunk, Ns)
        inside = d2 < r2
        order = jnp.where(inside, jnp.arange(ns, dtype=jnp.int32), ns)
        # top_k of negated index-order == first k support indices inside.
        neg, _ = jax.lax.top_k(-order, keff)
        idx = -neg
        idx, _ = _pad_k(idx, idx, k, ns, ns)
        found = idx < ns
        first = idx[:, :1]  # rows with zero hits keep ns (caller beware,
        # mirroring the reference which asserts > 0 hits in its oracle)
        idx = jnp.where(found, idx, first)
        sqd = jnp.take_along_axis(
            jnp.concatenate([d2, jnp.zeros_like(d2[:, :1])], axis=1),
            jnp.minimum(idx, ns),
            axis=1,
        )
        return idx.astype(jnp.int32), sqd

    return chunked_over_queries(per_chunk, query, chunk)


def ball_query(query, support, radius: float, k: int, return_distance: bool = False):
    """First-k supports within ``radius`` of each query (index order).

    Short rows are padded with the row's first found index, matching
    mvpnet/ops/cuda/ball_query_kernel.cu as pinned by
    mvpnet/ops/tests/test_ball_query.py:33-38.
    """
    idx, sqd = _maybe_vmap(
        functools.partial(_ball_core, radius=radius, k=k), query, support
    )
    if return_distance:
        return idx, sqd
    return idx
