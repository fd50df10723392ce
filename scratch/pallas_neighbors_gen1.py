"""Fused radius-top-k Pallas kernel — the pyramid's selection hot loop.

Replaces the ``pairwise_sq_dists`` + ``approx_min_k`` pair used by
``radius_neighbors`` (itself the TPU replacement for the reference's
per-cloud nanoflann radius search, neighbors.cpp:211-332). The XLA path
materializes the (Nq, Ns) distance matrix in HBM and pays ~0.35 µs/row of
``approx_min_k`` overhead; here distances, the radius mask, and the whole
selection run in VMEM per query tile and only the final (Nq, k) indices
leave the chip:

  1. distances for a (TQ, Ns) tile via one MXU matmul (f32 HIGHEST —
     a plain f32 dot multiplies in bf16 on TPU and destroys the
     ``q²−2qs+s²`` cancellation);
  2. per-128-lane-block top-3 by iterative min-extraction (pure VPU) —
     3·(Ns/128) candidates per query;
  3. exact top-k over the candidates, ascending, radius-filtered, with
     shadow index Ns for empty slots (the reference's padding convention,
     neighbors.cpp:319-325).

Step 2 is the same blockwise partial reduction ``approx_min_k`` performs,
so the wrapper pre-shuffles supports with a fixed permutation: spatially
ordered inputs (grid-subsample output is voxel-sorted) would cluster the
in-radius neighbors into few lane blocks and sink recall (measured 0.93
sorted vs 1.00 shuffled on shell clouds at top-3/128).

Status (measured on v5e, B=4 Nq=20480 Ns=16384 k=30): ~156 ms vs 36 ms for
the XLA ``pairwise_sq_dists``+``approx_min_k`` path — the iterative
min-extraction runs at ~10% VPU efficiency in the (TQ, NB, 128) layout and
the k sequential phase-2 rounds are latency-bound, while approx_min_k's
fused PartialReduce is hard to beat. Recall is excellent (0.9999 vs exact
at production shapes) but the kernel stays OPT-IN
(``PyramidSpec.neighbor_method='pallas'``) pending a layout rework
(candidate ideas: tq on sublanes during extraction, tournament-tree
phase 2, bf16 distance pass). The XLA approx path remains the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvkpconv_tpu.ops.pallas.kpconv import pallas_supported

_BIG = 1e30  # plain float: jnp constants must not be captured by kernels
_PER_BLOCK = 3  # candidates kept per 128-lane block (recall 1.0 shuffled)
_LANES = 128


def _extract_min(vals, iota, axis=-1):
    """(min value, first index achieving it) along ``axis`` — VPU only."""
    m = jnp.min(vals, axis=axis)
    sel = vals <= jnp.expand_dims(m, axis)
    idx = jnp.min(jnp.where(sel, iota, jnp.int32(1 << 30)), axis=axis)
    return m, idx


_CHUNK = 4096  # support lanes processed per inner iteration (VMEM budget)


def _kernel(q_ref, s_ref, idx_ref, val_ref, cv_ref, ci_ref, *, r2, k, ns):
    q = q_ref[0]  # (TQ, 3)
    tq = q.shape[0]
    sc = min(_CHUNK, ns)
    nb = sc // _LANES  # blocks per chunk
    n_chunks = ns // sc
    q2 = jnp.sum(q * q, axis=-1)  # (TQ,)

    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, nb, _LANES), 2)
    block_base = jax.lax.broadcasted_iota(jnp.int32, (tq, nb), 1) * _LANES

    def chunk_body(c, _):
        s = s_ref[0, pl.ds(c * sc, sc), :]  # (SC, 3)
        s2 = jnp.sum(s * s, axis=-1)
        cross = jax.lax.dot_general(
            q, s.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TQ, SC)
        d2 = q2[:, None] - 2.0 * cross + s2[None, :]
        d3 = jnp.where(d2 < r2, jnp.maximum(d2, 0.0), _BIG).reshape(
            tq, nb, _LANES
        )
        base = block_base + c * sc
        # top-_PER_BLOCK per 128-lane block → scratch slot (leading axis:
        # Mosaic only supports dynamic offsets on sublane-group dims)
        for p in range(_PER_BLOCK):
            m, i = _extract_min(d3, iota)
            cv_ref[c * _PER_BLOCK + p] = m
            ci_ref[c * _PER_BLOCK + p] = base + i
            if p + 1 < _PER_BLOCK:
                d3 = jnp.where(iota == i[..., None], _BIG, d3)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # phase 2: exact ascending top-k over the collected (S, TQ, NB)
    # candidates; the stored ci are globally unique per row, so the chosen
    # element is identified by (value, id) instead of a positional index
    def select_body(j, _):
        cv = cv_ref[:, :, :]
        ci = ci_ref[:, :, :]
        m = jnp.min(jnp.min(cv, axis=0), axis=-1)  # (TQ,)
        sel = cv <= m[None, :, None]
        gi = jnp.min(
            jnp.min(jnp.where(sel, ci, jnp.int32(1 << 30)), axis=0), axis=-1
        )  # (TQ,)
        idx_ref[0, j, :] = jnp.where(m < _BIG, gi, jnp.int32(ns))
        val_ref[0, j, :] = jnp.where(m < _BIG, m, jnp.float32(np.inf))
        chosen = sel & (ci == gi[None, :, None])
        cv_ref[:, :, :] = jnp.where(chosen, _BIG, cv)
        return 0

    jax.lax.fori_loop(0, k, select_body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "k", "tq", "interpret"))
def _fused_call(query, support, radius: float, k: int, tq: int,
                interpret: bool):
    b, nq, _ = query.shape
    ns = support.shape[1]
    grid = (b, nq // tq)
    idx, vals = pl.pallas_call(
        functools.partial(_kernel, r2=float(radius) ** 2, k=k, ns=ns),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, 3), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, 3), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, tq), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tq), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k, nq), jnp.int32),
            jax.ShapeDtypeStruct((b, k, nq), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                ((ns // min(_CHUNK, ns)) * _PER_BLOCK, tq,
                 min(_CHUNK, ns) // _LANES),
                jnp.float32,
            ),
            pltpu.VMEM(
                ((ns // min(_CHUNK, ns)) * _PER_BLOCK, tq,
                 min(_CHUNK, ns) // _LANES),
                jnp.int32,
            ),
        ],
        interpret=interpret,
    )(query, support)
    # outputs are (B, k, Nq) — k on the sublane axis inside the kernel
    # because Mosaic cannot store at dynamic lane offsets
    return jnp.swapaxes(idx, 1, 2), jnp.swapaxes(vals, 1, 2)


@functools.lru_cache(maxsize=None)
def _shuffle_perm(ns: int):
    perm = np.random.RandomState(0).permutation(ns).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(ns, dtype=np.int32)
    return perm, inv


def fused_radius_topk(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    k: int,
    return_distance: bool = False,
    tq: int = 128,
    interpret: bool = False,
):
    """Up-to-k nearest supports within ``radius``, fused in one Pallas pass.

    Same contract as :func:`mvkpconv_tpu.ops.neighbors.radius_neighbors`
    (distance-sorted ascending, shadow index Ns). Recall ≈ 1.0 on scan-like
    clouds (fixed pre-shuffle + top-3 per 128-lane block; see module doc).

    Args:
      query: (B, Nq, 3); Nq must be a multiple of ``tq``.
      support: (B, Ns, 3); Ns a multiple of 128.
      radius, k: search ball and neighbor budget.
      return_distance: also return (B, Nq, k) squared distances (inf at
        shadow slots).
    """
    b, nq, _ = query.shape
    ns = support.shape[1]
    if nq % tq or ns % _LANES:
        raise ValueError(f"shapes not tiled: Nq={nq} (tq={tq}), Ns={ns}")
    perm, _ = _shuffle_perm(ns)
    perm_j = jnp.asarray(perm)
    shuffled = jnp.take(support, perm_j, axis=1)
    k_eff = max(8, int(k))  # Mosaic block dims need sublane multiples of 8
    idx, vals = _fused_call(
        query.astype(jnp.float32), shuffled.astype(jnp.float32),
        float(radius), k_eff, int(tq), bool(interpret),
    )
    idx, vals = idx[..., :k], vals[..., :k]
    # map shuffled positions back to original ids (shadow ns stays ns)
    perm_pad = jnp.concatenate([perm_j, jnp.asarray([ns], jnp.int32)])
    idx = jnp.take(perm_pad, idx.reshape(-1), axis=0).reshape(idx.shape)
    if return_distance:
        return idx, vals
    return idx


def fused_supported() -> bool:
    return pallas_supported()
