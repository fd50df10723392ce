"""Fused Pallas KPConv kernel vs the pure-JAX oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models.kernel_points import kernel_point_positions
from mvkpconv_tpu.ops.pallas.kpconv import _reference_math, kpconv_fused


def _inputs(rng, b=2, n=256, k=16, m=15, cin=8, cout=16, shadow_rows=True):
    rel = (rng.rand(b, n, k, 3).astype(np.float32) - 0.5) * 0.2
    if shadow_rows:
        rel[:, :, -3:] = 1e6  # shadow neighbors
    nx = rng.randn(b, n, k, cin).astype(np.float32)
    nx[:, :, -3:] = 0.0
    kp = kernel_point_positions(0.1, m)
    w = (rng.randn(m * cin, cout) * 0.05).astype(np.float32)
    return (jnp.asarray(rel), jnp.asarray(nx), jnp.asarray(kp), jnp.asarray(w))


def test_fused_matches_oracle(rng):
    rel, nx, kp, w = _inputs(rng)
    out = kpconv_fused(rel, nx, kp, w, 0.06, True)  # interpret mode
    ref = _reference_math(rel, nx, kp, w, 0.06)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_small_n_tile(rng):
    rel, nx, kp, w = _inputs(rng, n=64)  # N < 128 → tile = N
    out = kpconv_fused(rel, nx, kp, w, 0.06, True)
    ref = _reference_math(rel, nx, kp, w, 0.06)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_backward_matches_oracle(rng):
    rel, nx, kp, w = _inputs(rng, n=128)

    def loss_fused(nx, w):
        return jnp.sum(kpconv_fused(rel, nx, kp, w, 0.06, True) ** 2)

    def loss_ref(nx, w):
        return jnp.sum(_reference_math(rel, nx, kp, w, 0.06) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(nx, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(nx, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
