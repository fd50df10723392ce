"""Static-budget calibration.

Replaces the reference's runtime calibration (ScanNet_sphere_color.py:1272
``sampler.calibration``: a P-controller on the batch point budget plus
90th-percentile neighbor-count histograms cached in pickles). Under XLA the
budgets must be static, so calibration runs once up front: sample spheres,
build exact-neighbor pyramids on the host, and report per-level point counts
and neighbor-count percentiles to fill ``KPConfig.num_points`` /
``conv_neighbors`` / ``pool_neighbors``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


def _round_up(x: float, multiple: int) -> int:
    return int(-(-x // multiple) * multiple)


def calibrate_budgets(
    dataset,
    num_spheres: int = 32,
    point_percentile: float = 98.0,
    neighbor_percentile: float = 90.0,
    point_multiple: int = 256,
) -> Dict[str, tuple]:
    """Measure point/neighbor statistics over sampled spheres.

    Args:
      dataset: a SphereDataset (training=False recommended).
      num_spheres: sample size.
      point_percentile: per-level point budget percentile (padding covers
        the rest; the reference instead packed variable batches).
      neighbor_percentile: neighbor-count percentile (the reference's
        "90% untouched" criterion, ScanNet_sphere.py:1326-1576).

    Returns:
      dict with 'num_points', 'conv_neighbors', 'pool_neighbors' tuples
      ready to drop into KPConfig.replace(...).
    """
    from mvkpconv_tpu.data.spheres import grid_subsample_np

    cfg = dataset.cfg
    spec = cfg.pyramid_spec()
    levels = spec.num_levels
    counts = [[] for _ in range(levels)]
    conv_counts = [[] for _ in range(levels)]
    pool_counts = [[] for _ in range(levels - 1)]

    for _ in range(num_spheres):
        item = dataset.sample_sphere()
        pts = item["points"][item["mask"]]
        level_pts = [pts]
        for l in range(levels):
            p = level_pts[l]
            counts[l].append(len(p))
            r = spec.radius(l)
            d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
            conv_counts[l].append(np.quantile((d2 < r**2).sum(1), 0.99))
            if l + 1 < levels:
                sub, _, _ = grid_subsample_np(
                    p, p, np.zeros(len(p), np.int32), spec.cell_size(l + 1), 1
                )
                d2p = ((sub[:, None] - p[None]) ** 2).sum(-1)
                pool_counts[l].append(np.quantile((d2p < r**2).sum(1), 0.99))
                level_pts.append(sub)

    num_points = tuple(
        _round_up(np.percentile(c, point_percentile), point_multiple)
        for c in counts
    )
    conv = tuple(
        int(np.ceil(np.percentile(c, neighbor_percentile))) for c in conv_counts
    )
    pool = tuple(
        int(np.ceil(np.percentile(c, neighbor_percentile))) for c in pool_counts
    )
    return {
        "num_points": num_points,
        "conv_neighbors": conv,
        "pool_neighbors": pool,
    }
