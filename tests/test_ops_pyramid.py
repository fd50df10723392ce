"""Tests for the on-device multiscale pyramid builder."""

import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops import masked_points
from mvkpconv_tpu.ops.pyramid import (
    PyramidSpec,
    build_pyramid,
    num_layers_from_architecture,
)

ARCH = [
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
]


def test_num_layers_from_architecture():
    assert num_layers_from_architecture(ARCH) == 3
    deeper = ["simple"] + ["resnetb", "resnetb_strided"] * 4 + ["nearest_upsample"]
    assert num_layers_from_architecture(deeper) == 5


def _make_batch(rng, b=2, n=512):
    pts = rng.rand(b, n, 3).astype(np.float32) * 2.0
    mask = np.ones((b, n), bool)
    mask[:, n - 40 :] = False
    pts = np.asarray(masked_points(jnp.asarray(pts), jnp.asarray(mask)))
    return jnp.asarray(pts), jnp.asarray(mask)


def test_pyramid_shapes_and_masks(rng):
    spec = PyramidSpec.for_architecture(ARCH, num_points0=512, first_subsampling_dl=0.08)
    pts, mask = _make_batch(rng)
    pyr = build_pyramid(pts, mask, spec)
    assert len(pyr.points) == 3 and len(pyr.pools) == 2 and len(pyr.upsamples) == 2
    for l in range(3):
        assert pyr.points[l].shape == (2, spec.num_points[l], 3)
        assert pyr.neighbors[l].shape == (2, spec.num_points[l], spec.conv_neighbors[l])
    counts = [int(m.sum()) for m in pyr.masks]
    assert counts[0] > counts[1] > counts[2] > 0


def test_pyramid_neighbors_within_radius(rng):
    spec = PyramidSpec.for_architecture(ARCH, num_points0=512, first_subsampling_dl=0.08)
    pts, mask = _make_batch(rng)
    pyr = build_pyramid(pts, mask, spec)
    for l in range(3):
        p = np.asarray(pyr.points[l])
        idx = np.asarray(pyr.neighbors[l])
        n = p.shape[1]
        r = spec.radius(l)
        padded = np.concatenate([p, np.full((2, 1, 3), 1e6, np.float32)], axis=1)
        for b in range(2):
            gathered = padded[b][idx[b]]  # (N, K, 3)
            d2 = ((gathered - p[b][:, None]) ** 2).sum(-1)
            valid = idx[b] < n
            vm = np.asarray(pyr.masks[l][b])
            assert (d2[valid & vm[:, None]] < r**2 + 1e-5).all()


def test_pyramid_pool_and_upsample_indices(rng):
    spec = PyramidSpec.for_architecture(ARCH, num_points0=512, first_subsampling_dl=0.08)
    pts, mask = _make_batch(rng)
    pyr = build_pyramid(pts, mask, spec)
    for l in range(2):
        n_l = spec.num_points[l]
        n_next = spec.num_points[l + 1]
        assert pyr.pools[l].shape == (2, n_next, spec.pool_neighbors[l])
        assert int(np.asarray(pyr.pools[l]).max()) <= n_l
        assert pyr.upsamples[l].shape == (2, n_l, 1)
        assert int(np.asarray(pyr.upsamples[l]).max()) <= n_next


def test_pyramid_is_jittable(rng):
    spec = PyramidSpec.for_architecture(ARCH, num_points0=256, first_subsampling_dl=0.1)
    pts, mask = _make_batch(rng, n=256)
    jitted = jax.jit(lambda p, m: build_pyramid(p, m, spec))
    pyr = jitted(pts, mask)
    pyr2 = build_pyramid(pts, mask, spec)
    np.testing.assert_allclose(
        np.asarray(pyr.points[1]), np.asarray(pyr2.points[1]), rtol=1e-6
    )


def test_deform_conv_pool_flags_and_radii():
    """Reference semantics (datasets/common.py:556-610): conv radius widened
    by any deformable block in the layer; pool radius only by a deformable
    STRIDED block; upsample threshold follows the pool radius."""
    from mvkpconv_tpu.ops.pyramid import deform_flags_from_architecture

    arch = (
        "simple",
        "resnetb_deformable",     # layer 0 conv deform
        "resnetb_strided",        # layer 0 strided RIGID → pool 0 rigid
        "resnetb",
        "resnetb_deformable_strided",  # layer 1 strided deform → pool 1 deform
        "resnetb_deformable",     # layer 2 conv deform
        "nearest_upsample",
        "unary",
    )
    conv_flags, pool_flags = deform_flags_from_architecture(arch)
    assert conv_flags == (True, False, True)
    assert pool_flags == (False, True)

    spec = PyramidSpec(
        num_points=(256, 64, 32),
        first_subsampling_dl=0.1,
        conv_radius=2.5,
        deform_radius=6.0,
        conv_neighbors=(10, 10, 10),
        pool_neighbors=(10, 10),
        deform_conv_levels=conv_flags,
        deform_pool_levels=pool_flags,
        deform_conv_neighbors=(24, 24, 24),
        deform_pool_neighbors=(24, 24),
    )
    assert spec.radius(0) == 0.1 * 6.0          # conv widened
    assert spec.pool_radius(0) == 0.1 * 2.5     # pool rigid
    assert spec.radius(1) == 0.2 * 2.5
    assert spec.pool_radius(1) == 0.2 * 6.0     # deformable strided
    assert spec.conv_k(0) == 24 and spec.pool_k(0) == 10
    assert spec.conv_k(1) == 10 and spec.pool_k(1) == 24


def test_deform_level_neighbor_recall(rng):
    """A deformable level's conv rows must contain the full in-deform-radius
    neighbor set (given a calibrated deform budget), pool rows the rigid set."""
    n = 512
    pts = rng.rand(1, n, 3).astype(np.float32) * 1.2 - 0.6
    spec = PyramidSpec(
        num_points=(n, 128),
        first_subsampling_dl=0.1,
        conv_radius=2.5,
        deform_radius=6.0,
        conv_neighbors=(16, 16),
        pool_neighbors=(16,),
        deform_conv_levels=(True, False),
        deform_pool_levels=(False,),
        deform_conv_neighbors=(96, 96),
        neighbor_method="exact",
    )
    pyr = build_pyramid(jnp.asarray(pts), jnp.ones((1, n), bool), spec)
    assert pyr.neighbors[0].shape[-1] == 96  # deform budget applied
    assert pyr.pools[0].shape[-1] == 16
    rd = 0.1 * 6.0
    d2 = ((pts[0][:, None] - pts[0][None]) ** 2).sum(-1)
    conv = np.asarray(pyr.neighbors[0][0])
    for i in range(0, n, 13):
        want = set(np.flatnonzero(d2[i] < rd**2))
        got = set(conv[i][conv[i] < n])
        missing = want - got
        # rows with more in-radius neighbors than the budget may truncate
        assert not missing or len(want) > 96, (i, len(want), len(missing))
