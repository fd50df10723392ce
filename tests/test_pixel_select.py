"""Pallas fused pixel-selection kernel: interpret-mode parity tests.

Production uses the kernel only on TPU (`points_to_pixel_knn_projective`
falls back to 'minext' off-TPU); these tests drive the kernel itself in
interpret mode so its selection + in-kernel index decode are pinned
against the exact XLA path on every backend.
"""

import numpy as np

import jax.numpy as jnp

from mvkpconv_tpu.data import synthetic
from mvkpconv_tpu.ops import unproject_depth
from mvkpconv_tpu.ops.pallas.pixel_select import pixel_topk_indices
from mvkpconv_tpu.ops.unproject import (
    points_to_pixel_knn_projective,
    project_to_views,
)


def _setup(seed=11, h=48, w=64, v=3, n=300):
    scene = synthetic.make_scene(seed=seed, num_points=30000)
    views = synthetic.render_views(scene, v, h, w, seed=seed)
    rng = np.random.RandomState(seed)
    pts = scene["points"][rng.choice(len(scene["points"]), n, replace=False)]
    image_xyz, _ = unproject_depth(
        jnp.asarray(views["depth"][None]),
        jnp.asarray(views["intrinsics"][None]),
        jnp.asarray(views["poses"][None]),
    )
    return (
        jnp.asarray(pts[None]),
        image_xyz,
        jnp.asarray(views["intrinsics"][None]),
        jnp.asarray(views["poses"][None]),
    )


def _kernel_indices(points, image_xyz, intr, poses, k, window):
    """Drive pixel_topk_indices exactly as the production branch does."""
    b, v, h, w, _ = image_xyz.shape
    n = points.shape[1]
    ww = window * window
    u, vv = project_to_views(points, intr, poses)
    iu0 = jnp.clip(jnp.round(u).astype(jnp.int32) - window // 2, 0, w - window)
    iv0 = jnp.clip(jnp.round(vv).astype(jnp.int32) - window // 2, 0, h - window)
    hp, wp = h - window + 1, w - window + 1
    planar = jnp.transpose(image_xyz, (0, 1, 4, 2, 3)).reshape(b * v * 3, h, w)
    pshifts = [
        planar[:, dy : dy + hp, dx : dx + wp]
        for dy in range(window)
        for dx in range(window)
    ]
    pt = jnp.stack(pshifts, axis=1)
    patches = (
        pt.reshape(b * v, 3, ww, hp, wp)
        .transpose(0, 3, 4, 1, 2)
        .reshape(b * v * hp * wp, 3 * ww)
    )
    anchor = iv0 * wp + iu0
    bv_base = (jnp.arange(b * v, dtype=jnp.int32) * (hp * wp)).reshape(b, v, 1)
    flat_rows = (anchor + bv_base).transpose(0, 2, 1).reshape(-1)
    rows = jnp.take(patches, flat_rows, axis=0)
    cand = rows.reshape(b, n, v * 3 * ww)
    acode = ((iv0 << 16) | iu0).transpose(0, 2, 1)
    return pixel_topk_indices(
        points.astype(jnp.float32), cand, acode, v, window, h, w, k,
        interpret=True,
    )


def test_pallas_pixel_select_matches_minext():
    """Kernel selection + in-kernel decode == the exact XLA 'minext' path
    (up to the kernel's 2^-14 distance quantization, which can reorder
    near-ties — so compare selected DISTANCES, and index sets loosely)."""
    P, image_xyz, K, T = _setup()
    k, window = 3, 7
    ex = np.asarray(points_to_pixel_knn_projective(
        P, image_xyz, K, T, k, window=window, method="minext"))
    got = np.asarray(_kernel_indices(P, image_xyz, K, T, k, window))
    assert got.shape == ex.shape
    flat = np.asarray(image_xyz).reshape(-1, 3)
    pts = np.asarray(P)[0]
    d_ex = np.sort(np.linalg.norm(flat[ex[0]] - pts[:, None], axis=-1), -1)
    d_pl = np.sort(np.linalg.norm(flat[got[0]] - pts[:, None], axis=-1), -1)
    np.testing.assert_allclose(d_pl, d_ex, rtol=2e-4, atol=1e-5)
    same = np.mean([len(set(ex[0, i]) & set(got[0, i])) / 3.0
                    for i in range(len(pts))])
    assert same > 0.98, same


def test_pallas_pixel_select_nonmultiple_tile():
    """Query counts that don't divide the tile are padded and trimmed."""
    P, image_xyz, K, T = _setup(seed=5, n=173)
    got = np.asarray(_kernel_indices(P, image_xyz, K, T, 3, 5))
    assert got.shape == (1, 173, 3)
    v, h, w = image_xyz.shape[1], image_xyz.shape[2], image_xyz.shape[3]
    assert (got >= 0).all() and (got < v * h * w).all()


def test_production_path_off_tpu_falls_back():
    """method='pallas' must produce valid output on any backend (the
    off-TPU fallback routes to 'minext')."""
    P, image_xyz, K, T = _setup(seed=9, n=128)
    idx = np.asarray(points_to_pixel_knn_projective(
        P, image_xyz, K, T, 3, window=5, method="pallas"))
    ex = np.asarray(points_to_pixel_knn_projective(
        P, image_xyz, K, T, 3, window=5, method="minext"))
    v, h, w = image_xyz.shape[1], image_xyz.shape[2], image_xyz.shape[3]
    assert idx.shape == (1, 128, 3)
    assert (idx >= 0).all() and (idx < v * h * w).all()
    flat = np.asarray(image_xyz).reshape(-1, 3)
    pts = np.asarray(P)[0]
    d_got = np.sort(np.linalg.norm(flat[idx[0]] - pts[:, None], axis=-1), -1)
    d_ex = np.sort(np.linalg.norm(flat[ex[0]] - pts[:, None], axis=-1), -1)
    np.testing.assert_allclose(d_got, d_ex, rtol=2e-4, atol=1e-5)


def test_per_view_candidate_assembly():
    """The production candidate assembly (ops/unproject.py:
    pallas_candidate_rows — one take per view, keeping every gather
    source under the measured ~64 MB start-rate cliff) must be exactly
    the b·v-folded single-take assembly it replaced."""
    points, image_xyz, intr, poses = _setup()
    window = 5
    b, v, h, w, _ = image_xyz.shape
    n = points.shape[1]
    ww = window * window
    hp, wp = h - window + 1, w - window + 1
    u, vv = project_to_views(points, intr, poses)
    iu0 = jnp.clip(jnp.round(u).astype(jnp.int32) - window // 2, 0, w - window)
    iv0 = jnp.clip(jnp.round(vv).astype(jnp.int32) - window // 2, 0, h - window)
    anchor = iv0 * wp + iu0

    from mvkpconv_tpu.ops.unproject import pallas_candidate_rows

    got = pallas_candidate_rows(image_xyz, anchor, window)
    assert got.shape == (b, n, v * 3 * ww)

    # independent reference: the folded single-take form
    planar = jnp.transpose(image_xyz, (0, 1, 4, 2, 3)).reshape(b * v * 3, h, w)
    pshifts = [
        planar[:, dy : dy + hp, dx : dx + wp]
        for dy in range(window)
        for dx in range(window)
    ]
    pt = jnp.stack(pshifts, axis=1)
    patches = (
        pt.reshape(b * v, 3, ww, hp, wp)
        .transpose(0, 3, 4, 1, 2)
        .reshape(b * v * hp * wp, 3 * ww)
    )
    bv_base = (jnp.arange(b * v, dtype=jnp.int32) * (hp * wp)).reshape(b, v, 1)
    flat_rows = (anchor + bv_base).transpose(0, 2, 1).reshape(-1)
    want = jnp.take(patches, flat_rows, axis=0).reshape(b, n, v * 3 * ww)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
