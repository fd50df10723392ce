"""Numpy-oracle tests for FPS and grid subsampling."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvkpconv_tpu.ops import farthest_point_sample, grid_subsample


def fps_np(points, num_centroids):
    """Reference oracle (mvpnet/ops/tests/test_fps.py:7-37)."""
    out = []
    for p in points:
        idx = [0]
        cur = 0
        dist2set = None
        for _ in range(1, num_centroids):
            d2 = ((p - p[cur]) ** 2).sum(1)
            dist2set = d2 if dist2set is None else np.minimum(d2, dist2set)
            cur = int(np.argmax(dist2set))
            idx.append(cur)
        out.append(idx)
    return np.asarray(out)


@pytest.mark.parametrize("b,n,m", [(2, 256, 32), (3, 257, 33), (1, 1024, 128)])
def test_fps_matches_reference_oracle(rng, b, n, m):
    points = rng.randn(b, n, 3).astype(np.float32)
    expected = fps_np(points, m)
    got = np.asarray(farthest_point_sample(jnp.asarray(points), m))
    np.testing.assert_array_equal(got, expected)


def test_fps_respects_mask(rng):
    points = rng.randn(2, 128, 3).astype(np.float32)
    mask = np.ones((2, 128), bool)
    mask[:, 100:] = False
    got = np.asarray(
        farthest_point_sample(jnp.asarray(points), 32, mask=jnp.asarray(mask))
    )
    assert (got < 100).all()


def grid_subsample_np(points, cell):
    """Voxel barycenters (grid_subsampling.cpp:53-103 oracle)."""
    origin = np.floor(points.min(0) / cell)
    vox = np.floor(points / cell) - origin
    keys = {}
    for p, v in zip(points, vox):
        keys.setdefault(tuple(v.astype(int)), []).append(p)
    return np.asarray(sorted(np.mean(ps, axis=0).tolist() for ps in keys.values()))


@pytest.mark.parametrize("n,cell", [(512, 0.3), (1000, 0.15)])
def test_grid_subsample_barycenters(rng, n, cell):
    points = rng.rand(n, 3).astype(np.float32) * 2.0
    expected = grid_subsample_np(points, cell)
    res = grid_subsample(jnp.asarray(points), cell, max_out=n)
    got = np.asarray(res.points)[np.asarray(res.mask)]
    assert int(res.num_valid) == len(expected)
    got = np.asarray(sorted(got.tolist()))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_grid_subsample_features_and_labels(rng):
    # two clusters of identical coordinates → two voxels, exact means/votes
    points = np.repeat(np.array([[0.1, 0.1, 0.1], [2.0, 2.0, 2.0]], np.float32), 5, 0)
    feats = np.arange(10, dtype=np.float32).reshape(10, 1)
    labels = np.array([3, 3, 3, 1, 1, 7, 7, 2, 7, 7], np.int32)
    res = grid_subsample(
        jnp.asarray(points), 0.5, max_out=8,
        features=jnp.asarray(feats), labels=jnp.asarray(labels), num_classes=8,
    )
    mask = np.asarray(res.mask)
    assert mask.sum() == 2 and int(res.num_valid) == 2
    got_f = np.asarray(res.features)[mask].ravel()
    np.testing.assert_allclose(sorted(got_f), [2.0, 7.0])  # means 0-4, 5-9
    got_l = np.asarray(res.labels)[mask]
    assert sorted(got_l.tolist()) == [3, 7]


def test_grid_subsample_mask_and_overflow(rng):
    points = rng.rand(256, 3).astype(np.float32)
    mask = np.ones((256,), bool)
    mask[200:] = False
    res = grid_subsample(jnp.asarray(points), 0.05, 64, mask=jnp.asarray(mask))
    # overflow: more voxels than max_out → num_valid reports the true count
    assert int(res.num_valid) >= 64
    assert np.asarray(res.mask).sum() == 64
    # batched form
    resb = grid_subsample(jnp.asarray(points)[None], 0.5, 64, mask=jnp.asarray(mask)[None])
    assert resb.points.shape == (1, 64, 3)
    assert int(resb.num_valid[0]) == np.asarray(resb.mask[0]).sum()
