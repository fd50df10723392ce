"""Numpy-oracle tests for neighbor ops (pattern: mvpnet/ops/tests/*)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvkpconv_tpu.ops import ball_query, knn, radius_neighbors
from mvkpconv_tpu.ops.common import SHADOW_COORD, masked_points


def knn_np(query, support, k):
    idx, dist = [], []
    for q, s in zip(query, support):
        d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        idx.append(order)
        dist.append(np.take_along_axis(d2, order, axis=1))
    return np.asarray(idx), np.asarray(dist)


def ball_query_np(query, support, radius, k):
    """Reference oracle semantics (test_ball_query.py:16-42)."""
    out = []
    for q, s in zip(query, support):
        rows = np.full((len(q), k), -1, np.int64)
        for i in range(len(q)):
            d2 = ((s - q[i]) ** 2).sum(1)
            nbr = np.nonzero(d2 < radius**2)[0]
            if nbr.size == 0:
                rows[i, :] = len(s)
            elif nbr.size < k:
                rows[i, : nbr.size] = nbr
                rows[i, nbr.size :] = nbr[0]
            else:
                rows[i] = nbr[:k]
        out.append(rows)
    return np.asarray(out)


def radius_neighbors_np(query, support, radius, k):
    """Distance-sorted first-k within radius, shadow-padded (neighbors.cpp)."""
    out = []
    for q, s in zip(query, support):
        rows = np.full((len(q), k), len(s), np.int64)
        for i in range(len(q)):
            d2 = ((s - q[i]) ** 2).sum(1)
            nbr = np.nonzero(d2 < radius**2)[0]
            nbr = nbr[np.argsort(d2[nbr], kind="stable")][:k]
            rows[i, : len(nbr)] = nbr
        out.append(rows)
    return np.asarray(out)


@pytest.mark.parametrize("b,n1,n2,k", [(2, 64, 128, 3), (3, 65, 129, 3), (2, 33, 65, 8)])
def test_knn_matches_numpy(rng, b, n1, n2, k):
    support = rng.randn(b, n2, 3).astype(np.float32)
    query = np.stack([s[rng.choice(n2, n1, replace=False)] for s in support])
    idx_np, d2_np = knn_np(query, support, k)
    idx, d2 = knn(jnp.asarray(query), jnp.asarray(support), k)
    np.testing.assert_allclose(np.sort(d2, -1), np.sort(d2_np, -1), rtol=2e-4, atol=1e-5)
    # indices may differ on exact ties; check distances per index agree
    gathered = np.take_along_axis(
        ((query[:, :, None] - support[:, None]) ** 2).sum(-1), np.asarray(idx), axis=2
    )
    np.testing.assert_allclose(gathered, d2_np, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("b,n1,n2,r,k", [(2, 64, 128, 0.5, 16), (3, 65, 129, 10.0, 8)])
def test_ball_query_matches_reference_oracle(rng, b, n1, n2, r, k):
    support = rng.randn(b, n2, 3).astype(np.float32)
    query = np.stack([s[rng.choice(n2, n1, replace=False)] for s in support])
    expected = ball_query_np(query, support, r, k)
    got = np.asarray(ball_query(jnp.asarray(query), jnp.asarray(support), r, k))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("b,n1,n2,r,k", [(2, 64, 128, 0.6, 16), (2, 128, 64, 0.4, 12)])
def test_radius_neighbors_matches_oracle(rng, b, n1, n2, r, k):
    support = rng.randn(b, n2, 3).astype(np.float32)
    query = rng.randn(b, n1, 3).astype(np.float32)
    expected = radius_neighbors_np(query, support, r, k)
    got = np.asarray(radius_neighbors(jnp.asarray(query), jnp.asarray(support), r, k))
    # sorted-by-distance with possible ties: compare the sets per row and the
    # shadow pattern
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(expected, -1))


def test_radius_neighbors_excludes_shadow_points(rng):
    support = rng.randn(1, 64, 3).astype(np.float32)
    mask = np.ones((1, 64), bool)
    mask[:, 40:] = False
    support_sh = np.asarray(masked_points(jnp.asarray(support), jnp.asarray(mask)))
    assert (support_sh[0, 40:] == SHADOW_COORD).all()
    query = support[:, :8]
    got = np.asarray(radius_neighbors(jnp.asarray(query), jnp.asarray(support_sh), 0.8, 16))
    # no padded support index may ever appear (indices 40..63); 64 = shadow ok
    body = got[got < 64]
    assert (body < 40).all()


def test_knn_large_uses_chunking(rng):
    # big enough that pick_chunk splits the query axis
    support = rng.randn(1, 4096, 3).astype(np.float32)
    query = rng.randn(1, 8192, 3).astype(np.float32)
    idx, d2 = knn(jnp.asarray(query), jnp.asarray(support), 3)
    assert idx.shape == (1, 8192, 3)
    brute = ((query[0, :16, None] - support[0, None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(d2)[0, :16], np.sort(brute, -1)[:, :3], rtol=2e-4, atol=1e-5
    )
