"""Native C++ host ops vs numpy oracles."""

import numpy as np
import pytest

from mvkpconv_tpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native host ops library unavailable (no g++?)")
    return True


def test_native_grid_subsample_matches_numpy(lib_available, rng):
    from mvkpconv_tpu.data.spheres import grid_subsample_np

    pts = rng.rand(5000, 3).astype(np.float32) * 4
    cols = rng.rand(5000, 3).astype(np.float32)
    labs = rng.randint(-1, 20, 5000).astype(np.int32)
    got = native.grid_subsample_native(pts, cols, labs, 0.25)
    assert got is not None
    g_pts, g_cols, g_labs = got

    # numpy reference (pure path): same voxel set, possibly different order
    origin = np.floor(pts.min(0) / 0.25)
    vox = (np.floor(pts / 0.25) - origin).astype(np.int64)
    key = (vox[:, 0] << 40) + (vox[:, 1] << 20) + vox[:, 2]
    n_vox = len(np.unique(key))
    assert len(g_pts) == n_vox

    order_a = np.lexsort(np.round(g_pts, 5).T)
    # rebuild numpy barycenters
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.r_[0, np.flatnonzero(key_s[1:] != key_s[:-1]) + 1]
    seg = np.cumsum(np.isin(np.arange(len(key_s)), starts)) - 1
    cnt = np.bincount(seg).astype(np.float64)
    ref_pts = np.stack(
        [np.bincount(seg, weights=pts[order][:, i]) for i in range(3)], 1
    ) / cnt[:, None]
    order_b = np.lexsort(np.round(ref_pts, 5).T)
    np.testing.assert_allclose(
        g_pts[order_a], ref_pts[order_b], rtol=1e-4, atol=1e-5
    )


def test_native_grid_subsample_majority_labels(lib_available):
    pts = np.repeat(np.array([[0.1, 0.1, 0.1], [3.0, 3.0, 3.0]], np.float32), 4, 0)
    cols = np.arange(8, dtype=np.float32).reshape(8, 1).repeat(3, 1)
    labs = np.array([2, 2, 5, 2, 7, 7, 7, -1], np.int32)
    g_pts, g_cols, g_labs = native.grid_subsample_native(pts, cols, labs, 0.5)
    assert sorted(g_labs.tolist()) == [2, 7]
    np.testing.assert_allclose(sorted(g_cols[:, 0].tolist()), [1.5, 5.5])


def test_native_1nn_exact(lib_available, rng):
    supports = rng.rand(3000, 3).astype(np.float32) * 5
    queries = rng.rand(500, 3).astype(np.float32) * 5
    idx, d2 = native.nearest_neighbor_1nn_native(queries, supports)
    brute = ((queries[:, None] - supports[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, brute.argmin(1))
    np.testing.assert_allclose(d2, brute.min(1), rtol=1e-5, atol=1e-7)


def test_native_1nn_clustered_supports(lib_available, rng):
    """Queries far from any support exercise the ring expansion."""
    supports = rng.rand(200, 3).astype(np.float32) * 0.5
    queries = (rng.rand(50, 3).astype(np.float32) * 0.5) + np.array([8, 8, 8], np.float32)
    idx, d2 = native.nearest_neighbor_1nn_native(queries, supports, cell=0.1)
    brute = ((queries[:, None] - supports[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, brute.argmin(1))
