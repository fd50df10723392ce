"""Fused KPConv Pallas kernel (opt-in; XLA path is currently faster).

Fuses the math of blocks.py:277-374 after the neighbor gathers — kernel
point influence weights, the per-kernel-point weighted feature sums and the
output matmul — into one VMEM-resident pass.

Status (measured on v5e, B=4 N=16384 K=30 M=15 Cin=Cout=32): 40.5 ms vs
30.4 ms for the XLA einsum chain — XLA fuses this pattern into the MXU well
on its own, and this kernel's per-KP (TQ, Cin)@(Cin, Cout) matmuls plus the
VMEM-forced small query tile underutilize the MXU. Kept (with oracle +
gradient tests) as groundwork for a revised layout; enable via
``KPConfig.use_pallas_kpconv``.

Gathers stay in XLA (dynamic-index gathers don't map to Mosaic); shadow
neighbors arrive pre-resolved (relative position ~1e6 ⇒ zero influence,
feature row zero), so the kernel needs no masking.

Backward: custom_vjp that differentiates the pure-JAX reference
implementation — bit-identical gradients to the unfused path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    """Mosaic kernels need a real TPU backend (incl. the axon relay)."""
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon")


def _reference_math(neighb_rel, nx, kernel_pts, weights2d, kp_extent):
    """Pure-JAX forward (linear influence, sum aggregation) — the oracle and
    the function whose VJP provides the backward pass."""
    diff = neighb_rel[..., None, :] - kernel_pts[None, None, None]
    sq = jnp.sum(diff * diff, axis=-1)  # (B, N, K, M)
    w = jnp.maximum(1.0 - jnp.sqrt(sq) / kp_extent, 0.0)
    wf = jnp.einsum("bqkm,bqkc->bqmc", w, nx, preferred_element_type=jnp.float32)
    b, n, m, c = wf.shape
    return jax.lax.dot_general(
        wf.reshape(b, n, m * c),
        weights2d,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(rel_ref, nx_ref, kp_ref, w_ref, out_ref, *, kp_extent, num_k, num_m, cin):
    rel = rel_ref[0]  # (TQ, K, 3)
    x = nx_ref[0]  # (TQ, K, Cin)
    kp = kp_ref[:]  # (M, 3)
    tq = rel.shape[0]

    # d² between every (query, neighbor) offset and every kernel point:
    # ‖rel‖² − 2 rel·kpᵀ + ‖kp‖² — the cross term is a (TQ·K, 3)@(3, M)
    # contraction, tiny but exact in fp32.
    rel2 = jnp.sum(rel * rel, axis=-1)  # (TQ, K)
    kp2 = jnp.sum(kp * kp, axis=-1)  # (M,)
    cross = jax.lax.dot_general(
        rel.reshape(tq * num_k, 3),
        kp.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # MXU defaults to bf16 multiply
    ).reshape(tq, num_k, num_m)
    sq = jnp.maximum(rel2[:, :, None] - 2.0 * cross + kp2[None, None, :], 0.0)
    w = jnp.maximum(1.0 - jnp.sqrt(sq) / kp_extent, 0.0)  # (TQ, K, M)

    # out[q] = Σ_m ( Σ_k w[q,k,m]·x[q,k,:] ) @ W[m·Cin:(m+1)·Cin]
    # — per kernel point: a VPU-weighted reduction over neighbors followed by
    # a small MXU matmul with the statically-sliced weight rows. (A single
    # (TQ, M·Cin) layout would be cheaper still, but Mosaic cannot collapse
    # the (M, Cin) minor dims into one lane axis.)
    xf = x.astype(jnp.float32)
    cout = w_ref.shape[-1]
    out = jnp.zeros((tq, cout), jnp.float32)
    for m in range(num_m):
        ym = jnp.sum(w[:, :, m][:, :, None] * xf, axis=1)  # (TQ, Cin)
        out = out + jax.lax.dot_general(
            ym,
            w_ref[m * cin : (m + 1) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = out


def _forward_pallas(neighb_rel, nx, kernel_pts, weights2d, kp_extent, interpret=False):
    b, n, k, _ = neighb_rel.shape
    m = kernel_pts.shape[0]
    cin = nx.shape[-1]
    cout = weights2d.shape[-1]
    # adaptive query tile: the kernel's live VMEM scales ~ tq·K·Cin (inputs,
    # the unrolled per-KP products and double buffering); tq·Cin ≤ 2048
    # keeps production shapes (K=30) under the 16 MB scoped-VMEM limit.
    tq = min(128, n, max(8, 2048 // max(cin, 1)))
    while n % tq != 0:
        tq //= 2
    assert tq >= 1 and n % tq == 0

    grid = (b, n // tq)
    return pl.pallas_call(
        functools.partial(
            _kernel, kp_extent=kp_extent, num_k=k, num_m=m, cin=cin
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, k, 3), lambda bi, qi: (bi, qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k, cin), lambda bi, qi: (bi, qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * cin, cout), lambda bi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, cout), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), jnp.float32),
        interpret=interpret,
    )(neighb_rel, nx, kernel_pts, weights2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def kpconv_fused(neighb_rel, nx, kernel_pts, weights2d, kp_extent, interpret=False):
    """Fused rigid KPConv (linear influence, sum aggregation).

    Args:
      neighb_rel: (B, N, K, 3) gathered neighbor positions − query position
        (shadow neighbors at ~1e6 ⇒ zero influence).
      nx: (B, N, K, Cin) gathered neighbor features (shadow rows zero).
      kernel_pts: (M, 3); weights2d: (M·Cin, Cout).
      kp_extent: influence width.

    Returns:
      (B, N, Cout) float32.
    """
    return _forward_pallas(
        neighb_rel, nx, kernel_pts, weights2d, kp_extent, interpret=interpret
    )


def _fwd(neighb_rel, nx, kernel_pts, weights2d, kp_extent, interpret):
    out = _forward_pallas(
        neighb_rel, nx, kernel_pts, weights2d, kp_extent, interpret=interpret
    )
    return out, (neighb_rel, nx, kernel_pts, weights2d)


def _bwd(kp_extent, interpret, residuals, g):
    neighb_rel, nx, kernel_pts, weights2d = residuals
    _, vjp = jax.vjp(
        lambda rel, x, kp, w: _reference_math(rel, x, kp, w, kp_extent),
        neighb_rel, nx, kernel_pts, weights2d,
    )
    return vjp(g)


kpconv_fused.defvjp(_fwd, _bwd)
