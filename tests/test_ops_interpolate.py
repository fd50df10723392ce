"""Tests for gather / interpolation ops, including gradients (the reference's
group_points / interpolate CUDA kernels have hand-written scatter-add
backwards; here we verify JAX's autodiff produces the same thing)."""

import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops import group_points, three_nn_interpolate
from mvkpconv_tpu.ops.gather import pad_shadow_row
from mvkpconv_tpu.ops.interpolate import feature_interpolate


def test_group_points_matches_numpy(rng):
    feats = rng.randn(2, 32, 5).astype(np.float32)
    idx = rng.randint(0, 32, size=(2, 16, 4)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
    expected = np.stack([f[i] for f, i in zip(feats, idx)])
    np.testing.assert_array_equal(got, expected)


def test_group_points_backward_is_scatter_add(rng):
    feats = rng.randn(8, 3).astype(np.float32)
    idx = np.array([[0, 0], [1, 7], [7, 7]], np.int32)
    g = rng.randn(3, 2, 3).astype(np.float32)

    grad = jax.grad(lambda f: jnp.sum(group_points(f, jnp.asarray(idx)) * g))(
        jnp.asarray(feats)
    )
    expected = np.zeros_like(feats)
    for i in range(idx.shape[0]):
        for j in range(idx.shape[1]):
            expected[idx[i, j]] += g[i, j]
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-6, atol=1e-6)


def test_pad_shadow_row_routes_to_zero(rng):
    feats = rng.randn(4, 3).astype(np.float32)
    padded = pad_shadow_row(jnp.asarray(feats))
    idx = jnp.asarray([[4, 0]], dtype=jnp.int32)
    out = np.asarray(group_points(padded, idx))
    np.testing.assert_array_equal(out[0, 0], np.zeros(3))
    np.testing.assert_array_equal(out[0, 1], feats[0])


def test_feature_interpolate_weighted_sum(rng):
    feats = rng.randn(1, 16, 6).astype(np.float32)
    idx = rng.randint(0, 16, size=(1, 10, 3)).astype(np.int32)
    w = rng.rand(1, 10, 3).astype(np.float32)
    got = np.asarray(
        feature_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    )
    expected = (feats[0][idx[0]] * w[0][..., None]).sum(1)[None]
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_three_nn_interpolate_exact_at_keys(rng):
    """Interpolating back at key locations must return the key features."""
    keys = rng.randn(2, 64, 3).astype(np.float32) * 5
    feats = rng.randn(2, 64, 4).astype(np.float32)
    out = three_nn_interpolate(jnp.asarray(keys), jnp.asarray(keys), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(out), feats, rtol=1e-4, atol=1e-4)


def test_three_nn_interpolate_inverse_distance(rng):
    keys = np.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]]], np.float32)
    feats = np.array([[[1.0], [2.0], [3.0], [100.0]]], np.float32)
    q = np.array([[[0.25, 0.25, 0.0]]], np.float32)
    out = float(
        three_nn_interpolate(jnp.asarray(q), jnp.asarray(keys), jnp.asarray(feats))[0, 0, 0]
    )
    d2 = ((q[0, 0] - keys[0]) ** 2).sum(1)
    inv = 1.0 / d2[:3]
    expected = float((inv / inv.sum() * feats[0, :3, 0]).sum())
    assert abs(out - expected) < 1e-4


def test_group_points_packed_matches_plain(rng):
    """The packed position⊕feature gather (bf16 pairs bitcast into f32
    lanes — the half-source-bytes form the 2D→3D lift rides,
    ops/gather.py:group_points_packed) must be numerically EXACT vs the
    plain path: xyz bit-identical f32, features bit-identical bf16."""
    from mvkpconv_tpu.ops import group_points_packed

    b, ns, nq, k, c = 2, 40, 12, 3, 8
    xyz = jnp.asarray(rng.randn(b, ns, 3), jnp.float32)
    feat = jnp.asarray(rng.randn(b, ns, c), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, ns, (b, nq, k)), jnp.int32)

    g_xyz, g_feat = group_points_packed(xyz, feat, idx)
    assert g_xyz.dtype == jnp.float32 and g_feat.dtype == jnp.bfloat16
    ref = group_points(jnp.concatenate(
        [xyz, feat.astype(jnp.float32)], axis=-1), idx)
    np.testing.assert_array_equal(np.asarray(g_xyz), np.asarray(ref[..., :3]))
    np.testing.assert_array_equal(
        np.asarray(g_feat, np.float32), np.asarray(ref[..., 3:])
    )


def test_group_points_packed_custom_vjp(rng):
    """lax.bitcast_convert_type has no autodiff rule, so the packed gather
    carries a custom VJP (two scatter-adds). Its gradients must match the
    plain concat-gather's autodiff gradients exactly."""
    from mvkpconv_tpu.ops import group_points_packed

    b, ns, nq, k, c = 2, 20, 6, 3, 4
    xyz = jnp.asarray(rng.randn(b, ns, 3), jnp.float32)
    feat = jnp.asarray(rng.randn(b, ns, c), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, ns, (b, nq, k)), jnp.int32)
    ct = jnp.asarray(rng.randn(b, nq, k, 3 + c), jnp.float32)

    def packed_loss(x, f):
        gx, gf = group_points_packed(x, f, idx)
        return jnp.sum(gx * ct[..., :3]) + jnp.sum(
            gf.astype(jnp.float32) * ct[..., 3:]
        )

    def plain_loss(x, f):
        g = group_points(
            jnp.concatenate([x, f.astype(jnp.float32)], axis=-1), idx
        )
        return jnp.sum(g[..., :3] * ct[..., :3]) + jnp.sum(
            g[..., 3:] * ct[..., 3:]
        )

    gx_p, gf_p = jax.grad(packed_loss, argnums=(0, 1))(xyz, feat)
    gx_r, gf_r = jax.grad(plain_loss, argnums=(0, 1))(xyz, feat)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-6)
    # plain path accumulates the feature scatter in f32 then jax casts the
    # final grad to the leaf dtype; packed does the same explicitly
    np.testing.assert_allclose(
        np.asarray(gf_p, np.float32), np.asarray(gf_r, np.float32),
        rtol=1e-2, atol=1e-2,
    )
