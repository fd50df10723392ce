"""Depth unprojection and on-device 2D→3D pixel-to-point association.

Replaces the reference's CPU-side geometry in the dataloader:
  * ``depth2xyz`` (mvpnet/data/scannet_2d3d.py:33-39): pinhole unprojection
    x=(u−cx)·z/fx, y=(v−cy)·z/fy;
  * camera-pose transform + valid-depth masking (scannet_2d3d.py:252-281);
  * the sklearn 3-NN from points to valid pixels (scannet_2d3d.py:309-313),
    which here is the on-device ``knn`` over shadow-masked pixel clouds —
    fused into the jitted step instead of burning dataloader CPUs.

Conventions: depth (B, V, H, W) float32 metres, 0 = invalid; intrinsics
(B, V, 3, 3); cam-to-world poses (B, V, 4, 4). Invalid pixels are placed at
``SHADOW_COORD`` so neighbor searches ignore them naturally.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mvkpconv_tpu.ops.common import SHADOW_COORD
from mvkpconv_tpu.ops.neighbors import knn


def unproject_depth(
    depth: jnp.ndarray, intrinsics: jnp.ndarray, poses: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject depth maps to world coordinates.

    Args:
      depth: (B, V, H, W) metres; <= 0 marks invalid pixels.
      intrinsics: (B, V, 3, 3) pinhole K.
      poses: (B, V, 4, 4) camera-to-world transforms.

    Returns:
      (image_xyz, valid): (B, V, H, W, 3) world positions with invalid pixels
      at SHADOW_COORD, and the (B, V, H, W) bool validity mask.
    """
    b, v, h, w = depth.shape
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    z = depth
    x = (us - cx) * z / fx
    y = (vs - cy) * z / fy
    cam = jnp.stack([x, y, z], axis=-1)  # (B, V, H, W, 3)
    rot = poses[..., :3, :3]
    trans = poses[..., :3, 3]
    world = (
        jnp.einsum("bvij,bvhwj->bvhwi", rot, cam) + trans[:, :, None, None, :]
    )
    valid = depth > 0
    world = jnp.where(valid[..., None], world, SHADOW_COORD)
    return world, valid


def points_to_pixel_knn(
    points: jnp.ndarray,
    image_xyz: jnp.ndarray,
    k: int = 3,
    method: str = "exact",
) -> jnp.ndarray:
    """Brute-force k-NN from 3D points into the flattened multi-view pixel
    cloud (reference semantics: global nearest valid pixels).

    Prefer :func:`points_to_pixel_knn_projective` when camera intrinsics and
    poses are available — it is ~100× fewer pairs at near-exact accuracy.

    Args:
      points: (B, N, 3) target points.
      image_xyz: (B, V, H, W, 3) unprojected pixels (invalid at SHADOW_COORD).
      k: pixel neighbors per point (reference uses 3).
      method: 'exact' (top_k sort) or 'approx' (TPU approx_min_k).

    Returns:
      (B, N, k) int32 indices into the V·H·W axis, directly consumable by
      ``group_points`` on (B, V·H·W, C) per-pixel features.
    """
    b = image_xyz.shape[0]
    flat = image_xyz.reshape(b, -1, 3)
    idx, _ = knn(points, flat, k, method=method)
    return idx


def project_to_views(
    points: jnp.ndarray, intrinsics: jnp.ndarray, poses: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole projection of world points into every view.

    Returns (u, v) pixel coordinates, each (B, V, N) float32.
    """
    rot = poses[..., :3, :3]  # cam-to-world
    trans = poses[..., :3, 3]
    # world → camera: X_cam = Rᵀ (X_w − t)
    rel = points[:, None, :, :] - trans[:, :, None, :]  # (B, V, N, 3)
    cam = jnp.einsum("bvij,bvni->bvnj", rot, rel)  # (B, V, N, 3)
    z = jnp.maximum(cam[..., 2], 1e-3)
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    u = cam[..., 0] / z * fx + cx
    v = cam[..., 1] / z * fy + cy
    return u, v


def pallas_candidate_rows(img: jnp.ndarray, anchor: jnp.ndarray,
                          window: int) -> jnp.ndarray:
    """Candidate-window rows for the Pallas pixel-selection kernel.

    Patch build runs on PLANAR single-coordinate images: the (tiny)
    (B,V,H,W,3)→(B·V·3,H,W) transpose first, so the window² stack writes
    are wide contiguous planes, then one row-major transpose of the patch
    image — measured ~4.5 ms faster end-to-end than stacking channel-last
    slices directly into row layout. Rows are per-view planar
    [x₀..x_{ww-1}, y…, z…] — the lane order the kernel slices coordinate
    planes from.

    The anchor rows are fetched with ONE take per view, not one take over
    the b·v-folded source: the gather start rate collapses ~3× once the
    source tensor passes ~64 MB (scratch/prof_lift_gather.py — 171M
    starts/s at ≤26 MB, 59-65M at 103 MB), and each row's candidates come
    from exactly one view, so per-view takes keep every source at
    b·hp·wp rows (~21 MB at bench shapes) with the same total start count
    (measured 5.5 → ~2 ms on the 327k-row gather). Equivalence with the
    folded single-take form is pinned by
    tests/test_pixel_select.py::test_per_view_candidate_assembly.

    Args:
      img: (B, V, H, W, 3) pixel positions (any float dtype).
      anchor: (B, V, N) int32 window-corner rows, iv0 * wp + iu0 with
        corners clipped in-bounds.
      window: window side.

    Returns:
      (B, N, V·3·window²) candidate rows, ordered view-major per point.
    """
    b, v, h, w, _ = img.shape
    n = anchor.shape[-1]
    ww = window * window
    hp, wp = h - window + 1, w - window + 1
    planar = jnp.transpose(img, (0, 1, 4, 2, 3)).reshape(b * v * 3, h, w)
    pshifts = [
        planar[:, dy : dy + hp, dx : dx + wp]
        for dy in range(window)
        for dx in range(window)
    ]
    pt = jnp.stack(pshifts, axis=1)  # (B·V·3, ww, hp, wp)
    patches = (
        pt.reshape(b * v, 3, ww, hp, wp)
        .transpose(0, 3, 4, 1, 2)
        .reshape(b, v, hp * wp, 3 * ww)
    )
    row_base = jnp.arange(b, dtype=jnp.int32)[:, None] * (hp * wp)
    per_view = [
        jnp.take(
            patches[:, vi].reshape(b * hp * wp, 3 * ww),
            (anchor[:, vi, :] + row_base).reshape(-1),
            axis=0,
        ).reshape(b, n, 3 * ww)
        for vi in range(v)
    ]
    return jnp.stack(per_view, axis=2).reshape(b, n, v * 3 * ww)


def points_to_pixel_knn_projective(
    points: jnp.ndarray,
    image_xyz: jnp.ndarray,
    intrinsics: jnp.ndarray,
    poses: jnp.ndarray,
    k: int = 3,
    window: int = 9,
    method: str = "approx",
    patch_dtype=None,
) -> jnp.ndarray:
    """Pixel association via camera projection — O(V·window²) per point.

    The nearest pixels (in 3D) to a point visible in a view lie around the
    point's pinhole projection into that view, and for occluded points the
    occluder's pixels sit on the same ray — so an exact 3D-distance search
    over a small window around each view's projection reproduces the
    brute-force k-NN at a tiny fraction of the work (the reference computes
    this association with a CPU ball-tree over ~100k pixels,
    scannet_2d3d.py:309-313). Pixels with invalid depth carry SHADOW
    coordinates and are naturally never selected.

    TPU design: XLA gathers of short rows are start-bound and gathers of
    multi-dim slices hit a slow path entirely (measured 2-5M starts/s), so
    the window extraction is restructured as **im2col + one row gather per
    (point, view)**: an (hp·wp, window²·3) patch image is materialized once
    per step with `window²` cheap shifted-slice copies (pure elementwise,
    HBM-bandwidth-bound), and each point then fetches its whole candidate
    window as a single contiguous ~1 KB row — the gather form the TPU
    executes fastest (measured 16× faster end-to-end than per-candidate row
    gathers). Selection is per-view ``approx_min_k`` followed by an exact
    cross-view merge of the V·k survivors; a query's true k nearest pixels
    are always contained in the union of per-view k-nearest sets, so the
    only approximation is approx_min_k's per-view recall (~0.95;
    ``method='exact'`` switches the per-view selection to a full sort).

    Args:
      points: (B, N, 3) world points.
      image_xyz: (B, V, H, W, 3) unprojected pixels (SHADOW where invalid).
      intrinsics: (B, V, 3, 3); poses: (B, V, 4, 4) cam-to-world.
      k: neighbors; window: candidate window side per view.
      method: 'pallas' (fused VPU kernel — d² + packed top-k extraction +
        in-kernel index decode, exact up to a 2⁻¹⁴ distance quantization;
        falls back to 'minext' off-TPU), 'minext' (single-stage k-round
        argmin extraction over all V·window² candidates), 'approx'
        (per-view approx_min_k + exact merge) or 'exact' (per-view top_k +
        exact merge).
      patch_dtype: storage dtype for the im2col patch image (None keeps
        ``image_xyz.dtype``). ``bfloat16`` halves the patch-gather bytes —
        the step's largest single HBM cost at window 9 — and only perturbs
        WHICH near-equidistant pixel is selected, not how near it is
        (measured RMS selected-pixel distance ratio vs exact 3-NN moves by
        <0.001 on synthetic scans); the relation features downstream are
        always computed from the full-precision ``image_xyz``.

    Returns:
      (B, N, k) int32 indices into the flattened V·H·W pixel axis.
    """
    b, v, h, w, _ = image_xyz.shape
    n = points.shape[1]
    ww = window * window
    u, vv = project_to_views(points, intrinsics, poses)
    # window START corner, clipped so the whole block stays in-bounds
    iu0 = jnp.clip(jnp.round(u).astype(jnp.int32) - window // 2, 0, w - window)
    iv0 = jnp.clip(jnp.round(vv).astype(jnp.int32) - window // 2, 0, h - window)

    # im2col: patches[y, x] = the (window, window) block anchored at (y, x)
    hp, wp = h - window + 1, w - window + 1
    img = image_xyz if patch_dtype is None else image_xyz.astype(patch_dtype)

    anchor = iv0 * wp + iu0  # (B, V, N), anchors are in-bounds by clipping
    bv_base = (jnp.arange(b * v, dtype=jnp.int32) * (hp * wp)).reshape(b, v, 1)

    if method == "pallas":
        from mvkpconv_tpu.ops.pallas.pixel_select import pallas_supported

        if not pallas_supported():
            # CPU backends: XLA selection (same policy as the pyramid's
            # binmin fallback); the kernel's interpret mode is exercised
            # by tests/test_pixel_select.py, not production
            method = "minext"
    if method == "pallas":
        # fused VPU selection: d² + packed top-k extraction in one kernel
        # (selection cost in the XLA paths is per-row sort/bin overhead)
        from mvkpconv_tpu.ops.pallas.pixel_select import pixel_topk_indices

        cand = pallas_candidate_rows(img, anchor, window)
        # anchors ride into the kernel (iv0 << 16 | iu0) so the winning
        # slots decode to flat pixel indices in-kernel — the XLA-side
        # take_along_axis decode alone measured ~4 ms/step
        acode = ((iv0 << 16) | iu0).transpose(0, 2, 1)  # (B, N, V)
        return pixel_topk_indices(
            points.astype(jnp.float32), cand, acode, v, window, h, w,
            min(k, v * ww),
        )

    shifts = [
        img[:, :, dy : dy + hp, dx : dx + wp, :]
        for dy in range(window)
        for dx in range(window)
    ]
    patches = jnp.stack(shifts, axis=-2).reshape(b * v * hp * wp, ww * 3)

    if method == "minext":
        # Single-stage EXACT selection over all V·ww candidates, n-major:
        # k rounds of (argmin, mask-out). The candidate count per point is
        # tiny (V·window² ≈ 245), so sort machinery (top_k = full per-row
        # sort on TPU) and per-row bin overhead (approx_min_k) are both
        # overkill — k fused argmin sweeps touch d2 k times with no sort
        # and need no cross-view merge stage (measured 3.3× the per-view
        # approx_min_k + merge path end-to-end on v5e).
        flat_rows = (anchor + bv_base).transpose(0, 2, 1).reshape(-1)
        rows = jnp.take(patches, flat_rows, axis=0)
        cand = rows.reshape(b, n, v * ww, 3)
        d2 = jnp.sum(
            (cand - points[:, :, None, :].astype(cand.dtype)) ** 2, axis=-1
        ).astype(jnp.float32)  # (B, N, V·ww)
        dv = jnp.arange(ww, dtype=jnp.int32) // window
        du = jnp.arange(ww, dtype=jnp.int32) % window
        view_base = (jnp.arange(v, dtype=jnp.int32) * h * w)[None, :, None, None]
        gi = (iv0[..., None] + dv) * w + (iu0[..., None] + du) + view_base
        gi = gi.transpose(0, 2, 1, 3).reshape(b, n, v * ww)
        outs = []
        for _ in range(min(k, v * ww)):
            am = jnp.argmin(d2, axis=-1)  # (B, N)
            outs.append(jnp.take_along_axis(gi, am[..., None], axis=-1)[..., 0])
            d2 = jnp.where(jax.nn.one_hot(am, v * ww, dtype=bool), jnp.inf, d2)
        return jnp.stack(outs, axis=-1).astype(jnp.int32)

    # flat jnp.take: ~3× faster than the batched take_along_axis lowering
    rows = jnp.take(patches, (anchor + bv_base).reshape(-1), axis=0)
    cand_xyz = rows.reshape(b, v, n, ww, 3)
    d2 = jnp.sum((cand_xyz - points[:, None, :, None, :]) ** 2, axis=-1)

    kv = min(k, ww)
    if method == "approx":
        vals, tl = jax.lax.approx_min_k(d2, kv)  # per-view partial top-k
    else:
        neg, tl = jax.lax.top_k(-d2, kv)
        vals = -neg
    dv, du = tl // window, tl % window
    view_base = (jnp.arange(v, dtype=jnp.int32) * h * w)[None, :, None, None]
    gi = (iv0[..., None] + dv) * w + (iu0[..., None] + du) + view_base

    # exact merge of the V·kv per-view survivors
    gi = jnp.transpose(gi, (0, 2, 1, 3)).reshape(b, n, v * kv)
    vals = jnp.transpose(vals, (0, 2, 1, 3)).reshape(b, n, v * kv)
    _, top = jax.lax.top_k(-vals, k)
    return jnp.take_along_axis(gi, top, axis=-1).astype(jnp.int32)
