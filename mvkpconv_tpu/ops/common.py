"""Shared conventions and helpers for the device op layer.

Padding convention ("shadow slot"), following the reference's scheme
(KPConv-PyTorch/models/blocks.py:277 appends a fake support point at +1e6 and
cpp_neighbors pads with index == num_supports): invalid / padded points live
at coordinate ``SHADOW_COORD`` so any distance computation naturally excludes
them, and neighbor indices equal to ``num_support`` denote "no neighbor".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Coordinate assigned to padded (invalid) points. Large enough that a padded
# point can never be inside any query radius, small enough that its square
# (1e12) is exactly representable in float32.
SHADOW_COORD = 1.0e6


def masked_points(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Push invalid points to the shadow location.

    Args:
      points: (..., N, 3) float array.
      mask: (..., N) boolean validity mask.

    Returns:
      (..., N, 3) with invalid rows set to SHADOW_COORD.
    """
    return jnp.where(mask[..., None], points, jnp.asarray(SHADOW_COORD, points.dtype))


def pairwise_sq_dists(query: jnp.ndarray, support: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances between two point sets.

    Uses the ‖q‖² − 2 q·s + ‖s‖² expansion so the cross term is a matmul that
    XLA places on the MXU. Clamped at zero (the expansion can go slightly
    negative in floating point).

    Note: bf16 selection was evaluated and rejected — with sphere extent R
    and conv radius r, the expansion's cancellation error scales with R²·2⁻⁸
    (≈0.006 at R=1.2), exceeding r²=0.01 at level 0. Selection needs fp32.

    Args:
      query: (..., Nq, D)
      support: (..., Ns, D)

    Returns:
      (..., Nq, Ns) float32 squared distances.
    """
    query = query.astype(jnp.float32)
    support = support.astype(jnp.float32)
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # (..., Nq, 1)
    s2 = jnp.sum(support * support, axis=-1, keepdims=True)  # (..., Ns, 1)
    # HIGHEST precision: on TPU a plain f32 einsum multiplies in bf16, which
    # destroys the cancellation in the expansion (errors ~1e0 at coord ~5).
    cross = jnp.einsum(
        "...qd,...sd->...qs",
        query,
        support,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = q2 - 2.0 * cross + jnp.swapaxes(s2, -1, -2)
    return jnp.maximum(d2, 0.0)


def chunked_over_queries(fn, query: jnp.ndarray, chunk: int):
    """Apply ``fn(query_chunk) -> pytree`` over chunks of the query axis.

    ``query`` has shape (Nq, ...); Nq must be divisible by ``chunk`` (callers
    pad). Keeps peak memory at O(chunk × Ns) instead of O(Nq × Ns) for the
    big distance matrices. Uses ``lax.map`` so the loop compiles to a single
    rolled XLA while-loop.
    """
    nq = query.shape[0]
    if nq <= chunk:
        return fn(query)
    assert nq % chunk == 0, f"query count {nq} not divisible by chunk {chunk}"
    chunks = query.reshape((nq // chunk, chunk) + query.shape[1:])
    out = jax.lax.map(fn, chunks)
    return jax.tree.map(lambda x: x.reshape((nq,) + x.shape[2:]), out)


def pick_chunk(nq: int, ns: int, budget_elems: int = 1 << 24) -> int:
    """Choose a query-chunk size keeping chunk×Ns ≤ budget (fp32 elems).

    Budget 2²⁴ ⇒ 1024-row chunks at 16k supports — measured 1.4× faster
    than 2048-row chunks (smaller live d² tiles pipeline better through
    the selection)."""
    chunk = max(1, budget_elems // max(ns, 1))
    chunk = min(chunk, nq)
    # Round down to a divisor of nq that is a multiple-of-8-friendly size.
    while nq % chunk != 0:
        chunk -= 1
    return chunk


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def _static_check(cond: bool, msg: str):
    if not cond:
        raise ValueError(msg)
