"""On-device multiscale input pyramid for KPConv-style networks.

TPU-native replacement for the reference's CPU-side input builders
(KPConv-PyTorch/datasets/common.py:536-652 ``segmentation_inputs`` and
:779-900 ``segmentation_inputs_sphere``), which call the C++ grid-subsampling
and nanoflann radius-search per batch on dataloader workers. Here the whole
pyramid — per-level points, conv neighbors, pooling neighbors and upsampling
indices — is computed **inside the jitted step** from fixed-shape padded
point batches, so the host pipeline only ships raw points.

Level conventions (matching the reference contract driven by
``config.architecture``):
  * level ``l`` cell size  dl_l = first_subsampling_dl · 2^l
  * conv radius            r_l  = dl_l · conv_radius
  * points_{l+1} = grid_subsample(points_l, dl_{l+1})
  * conv neighbors: radius r_l within level l           (K = conv_neighbors[l])
  * pool neighbors: radius r_l, queries level l+1, supports level l
  * upsample: 1-NN from level l queries into level l+1, within 2·r_l
All index matrices use the shadow convention (index == N_support ⇒ no
neighbor ⇒ zero feature row).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp

from mvkpconv_tpu.ops.neighbors import (
    bucketed_radius_neighbors,
    knn,
    radius_neighbors,
)
from mvkpconv_tpu.ops.sampling import grid_subsample


def num_layers_from_architecture(architecture: Sequence[str]) -> int:
    """Number of pyramid levels implied by a block list (config.py:237-279)."""
    layers = 1
    for block in architecture:
        if "upsample" in block or "global" in block:
            break
        if "pool" in block or "strided" in block:
            layers += 1
    return layers


# Default per-level neighbor budgets. The reference calibrates these as the
# 90th-percentile neighbor counts (ScanNet_sphere_color.py:1272); these values
# are in the range its calibration lands on for dl=0.04 / conv_radius=2.5.
DEFAULT_CONV_NEIGHBORS = (34, 34, 34, 34, 34)
DEFAULT_POOL_NEIGHBORS = (34, 34, 34, 34)


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static shape/geometry contract between data pipeline and model."""

    num_points: Tuple[int, ...]  # per-level point budgets, level 0 first
    first_subsampling_dl: float = 0.04
    conv_radius: float = 2.5
    deform_radius: float = 6.0
    conv_neighbors: Tuple[int, ...] = DEFAULT_CONV_NEIGHBORS
    pool_neighbors: Tuple[int, ...] = DEFAULT_POOL_NEIGHBORS
    deform_levels: Tuple[bool, ...] = ()  # per level: any deformable block?
    # 'exact' (top_k sort) | 'approx' (TPU approx_min_k) | 'bucketed'
    # (sorted rank-window candidate pruning + approx_min_k — the production
    # TPU path, ~3-5× fewer distance pairs; see neighbors.py)
    neighbor_method: str = "exact"

    @property
    def num_levels(self) -> int:
        return len(self.num_points)

    def cell_size(self, level: int) -> float:
        return self.first_subsampling_dl * (2.0**level)

    def radius(self, level: int) -> float:
        r = self.cell_size(level) * self.conv_radius
        if self.deform_levels and level < len(self.deform_levels) and self.deform_levels[level]:
            r = self.cell_size(level) * self.deform_radius
        return r

    @staticmethod
    def for_architecture(
        architecture: Sequence[str],
        num_points0: int,
        first_subsampling_dl: float = 0.04,
        conv_radius: float = 2.5,
        deform_radius: float = 6.0,
        conv_neighbors: Optional[Tuple[int, ...]] = None,
        pool_neighbors: Optional[Tuple[int, ...]] = None,
        subsample_ratio: float = 4.0,
    ) -> "PyramidSpec":
        """Derive budgets from a block list. Point budgets shrink by
        ``subsample_ratio`` per level (voxel size doubles ⇒ ~4-8× fewer
        points for surface-like clouds; 4 is conservative)."""
        levels = num_layers_from_architecture(architecture)
        pts, n = [], num_points0
        for _ in range(levels):
            pts.append(max(int(n), 8))
            n = n / subsample_ratio
        deform = []
        layer, has_deform = 0, False
        for block in architecture:
            if "upsample" in block or "global" in block:
                break
            has_deform = has_deform or ("deform" in block)
            if "pool" in block or "strided" in block:
                deform.append(has_deform)
                has_deform = False
                layer += 1
        deform.append(has_deform)
        return PyramidSpec(
            num_points=tuple(pts),
            first_subsampling_dl=first_subsampling_dl,
            conv_radius=conv_radius,
            deform_radius=deform_radius,
            conv_neighbors=conv_neighbors or DEFAULT_CONV_NEIGHBORS[:levels],
            pool_neighbors=pool_neighbors or DEFAULT_POOL_NEIGHBORS[: levels - 1],
            deform_levels=tuple(deform),
        )


class Pyramid(NamedTuple):
    """All per-level tensors a KPFCNN forward needs (cf. ScanNetCustomBatch,
    ScanNet_sphere_color.py:1525 — points/neighbors/pools/upsamples lists)."""

    points: Tuple[jnp.ndarray, ...]  # (B, N_l, 3), invalid at SHADOW_COORD
    masks: Tuple[jnp.ndarray, ...]  # (B, N_l) bool
    neighbors: Tuple[jnp.ndarray, ...]  # (B, N_l, Kc_l) int32, shadow = N_l
    pools: Tuple[jnp.ndarray, ...]  # (B, N_{l+1}, Kp_l) int32, shadow = N_l
    upsamples: Tuple[jnp.ndarray, ...]  # (B, N_l, 1) int32 into level l+1


def build_pyramid(
    points: jnp.ndarray, mask: jnp.ndarray, spec: PyramidSpec
) -> Pyramid:
    """Build the full input pyramid on device.

    Args:
      points: (B, N0, 3) float32, already grid-subsampled at
        ``first_subsampling_dl`` by the data pipeline, padded to N0.
      mask: (B, N0) validity.
      spec: static geometry/budget contract.

    Returns:
      ``Pyramid`` with ``spec.num_levels`` levels.
    """
    if points.shape[1] != spec.num_points[0]:
        raise ValueError(
            f"level-0 budget mismatch: points {points.shape[1]} vs spec "
            f"{spec.num_points[0]}"
        )
    pts, msks = [points], [mask]
    neighbors, pools, upsamples = [], [], []
    for level in range(spec.num_levels):
        p, m = pts[level], msks[level]
        r = spec.radius(level)
        kc = spec.conv_neighbors[level]
        if level + 1 < spec.num_levels:
            sub = grid_subsample(
                p, spec.cell_size(level + 1), spec.num_points[level + 1], mask=m
            )
            pts.append(sub.points)
            msks.append(sub.mask)
            # conv (queries = level l) and pool (queries = level l+1) share
            # the same supports and radius — one fused selection call
            kp = spec.pool_neighbors[level]
            q_both = jnp.concatenate([p, sub.points], axis=1)
            if spec.neighbor_method == "pallas":
                from mvkpconv_tpu.ops.pallas.neighbors import fused_radius_topk

                both = fused_radius_topk(q_both, p, r, max(kc, kp))
                up_idx = fused_radius_topk(p, sub.points, 2.0 * r, 1)
            elif spec.neighbor_method == "bucketed":
                both = bucketed_radius_neighbors(q_both, p, r, max(kc, kp))
                up_idx = bucketed_radius_neighbors(p, sub.points, 2.0 * r, 1)
            else:
                both = radius_neighbors(
                    q_both, p, r, max(kc, kp), method=spec.neighbor_method
                )
                up_idx, up_d2 = knn(p, sub.points, 1)
                up_idx = jnp.where(
                    up_d2 <= (2.0 * r) ** 2, up_idx, sub.points.shape[1]
                ).astype(jnp.int32)
            neighbors.append(both[:, : p.shape[1], :kc])
            pools.append(both[:, p.shape[1] :, :kp])
            upsamples.append(up_idx)
        else:
            method = spec.neighbor_method
            if method == "bucketed":
                neighbors.append(bucketed_radius_neighbors(p, p, r, kc))
            else:
                neighbors.append(radius_neighbors(p, p, r, kc, method=method))
    return Pyramid(
        points=tuple(pts),
        masks=tuple(msks),
        neighbors=tuple(neighbors),
        pools=tuple(pools),
        upsamples=tuple(upsamples),
    )
