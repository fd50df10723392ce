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

from mvkpconv_tpu.ops.neighbors import pool_and_upsample, radius_neighbors
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


def deform_flags_from_architecture(architecture: Sequence[str]):
    """(conv_flags, pool_flags) per level, reference semantics
    (datasets/common.py:556-610): conv widened if any deformable block
    convolves at the level; pool widened iff the strided block itself is
    deformable."""
    conv_flags, pool_flags = [], []
    layer_blocks = []
    for block in architecture:
        if "upsample" in block or "global" in block:
            break
        if not ("pool" in block or "strided" in block):
            layer_blocks.append(block)
            continue
        conv_flags.append(any("deform" in b for b in layer_blocks))
        pool_flags.append("deform" in block)
        layer_blocks = []
    conv_flags.append(any("deform" in b for b in layer_blocks))
    return tuple(conv_flags), tuple(pool_flags)


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
    # Per-level deform flags, mirroring the reference's input builder
    # (datasets/common.py:556-610): the CONV radius is widened to
    # deform_radius if any deformable block convolves at that level, while
    # the POOL radius (and the 2× upsample radius derived from it) is
    # widened only if the strided block itself is deformable.
    deform_conv_levels: Tuple[bool, ...] = ()
    deform_pool_levels: Tuple[bool, ...] = ()
    # Optional per-level neighbor budgets used where the radius is
    # deform-widened (the reference calibrates larger limits there,
    # datasets/common.py:411-421); None falls back to conv/pool_neighbors.
    deform_conv_neighbors: Optional[Tuple[int, ...]] = None
    deform_pool_neighbors: Optional[Tuple[int, ...]] = None
    # 'exact' (top_k sort) | 'approx' (TPU approx_min_k) | 'binmin'
    # (fused Pallas bin-min selection kernel, 5.3× the approx path on TPU —
    # see ops/pallas/radius_topk.py; falls back to 'approx' on CPU).
    # Superseded generations ('bucketed' rank-window pruning, the gen-1
    # 'pallas' fused kernel) are parked in scratch/; findings in RESULTS.md.
    neighbor_method: str = "exact"

    @property
    def num_levels(self) -> int:
        return len(self.num_points)

    def cell_size(self, level: int) -> float:
        return self.first_subsampling_dl * (2.0**level)

    def _deform(self, flags, level: int) -> bool:
        return bool(flags) and level < len(flags) and flags[level]

    def radius(self, level: int) -> float:
        """Conv-neighbor radius at ``level``."""
        mult = (
            self.deform_radius
            if self._deform(self.deform_conv_levels, level)
            else self.conv_radius
        )
        return self.cell_size(level) * mult

    def pool_radius(self, level: int) -> float:
        """Pool-neighbor radius at ``level`` (queries = level+1)."""
        mult = (
            self.deform_radius
            if self._deform(self.deform_pool_levels, level)
            else self.conv_radius
        )
        return self.cell_size(level) * mult

    def conv_k(self, level: int) -> int:
        if (
            self._deform(self.deform_conv_levels, level)
            and self.deform_conv_neighbors is not None
        ):
            return self.deform_conv_neighbors[level]
        return self.conv_neighbors[level]

    def pool_k(self, level: int) -> int:
        if (
            self._deform(self.deform_pool_levels, level)
            and self.deform_pool_neighbors is not None
        ):
            return self.deform_pool_neighbors[level]
        return self.pool_neighbors[level]

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
        conv_flags, pool_flags = deform_flags_from_architecture(architecture)
        return PyramidSpec(
            num_points=tuple(pts),
            first_subsampling_dl=first_subsampling_dl,
            conv_radius=conv_radius,
            deform_radius=deform_radius,
            conv_neighbors=conv_neighbors or DEFAULT_CONV_NEIGHBORS[:levels],
            pool_neighbors=pool_neighbors or DEFAULT_POOL_NEIGHBORS[: levels - 1],
            deform_conv_levels=conv_flags,
            deform_pool_levels=pool_flags,
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
    def select(queries, supports, radius, k):
        method = spec.neighbor_method
        if method == "binmin":
            from mvkpconv_tpu.ops.pallas.radius_topk import (
                IDX_BITS,
                NBINS,
                binmin_radius_topk,
                pallas_supported,
            )

            if (
                pallas_supported()
                and supports.shape[-2] <= (1 << IDX_BITS)
                and k <= NBINS
            ):
                return binmin_radius_topk(queries, supports, radius, k)
            # CPU backends / oversize supports: XLA approx path
            return radius_neighbors(queries, supports, radius, k, method="approx")
        return radius_neighbors(queries, supports, radius, k, method=method)

    for level in range(spec.num_levels):
        p, m = pts[level], msks[level]
        rc = spec.radius(level)
        kc = spec.conv_k(level)
        if level + 1 < spec.num_levels:
            sub = grid_subsample(
                p, spec.cell_size(level + 1), spec.num_points[level + 1], mask=m
            )
            pts.append(sub.points)
            msks.append(sub.mask)
            rp = spec.pool_radius(level)
            kp = spec.pool_k(level)
            conv_i = select(p, p, rc, kc)
            if spec.neighbor_method == "binmin":
                pool_i = select(sub.points, p, rp, kp)
                # upsample: 1-NN into level l+1 within 2× the POOL radius
                # (common.py:608-610 — "radius of the next layer"). k=1
                # through the bin-min kernel is exact up to the kernel's
                # 2⁻⁹-quantized distance keys (near-ties within ~0.2%
                # relative distance can pick a marginally farther point —
                # don't rely on strict ordering for tie-sensitive
                # consumers), and 2.8× the argmin sweep at L0 (2.0 vs 5.7 ms)
                up_idx = select(p, sub.points, 2.0 * rp, 1)
            else:
                # pool + upsample share ONE distance sweep (the upsample's
                # 1-NN is the column argmin of the pool matrix)
                pool_i, up_idx = pool_and_upsample(
                    sub.points, p, rp, kp, 2.0 * rp,
                    method=spec.neighbor_method,
                )
            neighbors.append(conv_i)
            pools.append(pool_i)
            upsamples.append(up_idx)
        else:
            neighbors.append(select(p, p, rc, kc))
    return Pyramid(
        points=tuple(pts),
        masks=tuple(msks),
        neighbors=tuple(neighbors),
        pools=tuple(pools),
        upsamples=tuple(upsamples),
    )
