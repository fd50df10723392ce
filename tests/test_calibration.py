"""Budget calibration helper test."""

import numpy as np

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.calibration import calibrate_budgets
from mvkpconv_tpu.training.config import KPConfig


def test_calibrate_budgets_shapes_and_sanity():
    cfg = KPConfig(
        architecture=("simple", "resnetb_strided", "resnetb",
                      "resnetb_strided", "resnetb", "nearest_upsample",
                      "unary", "nearest_upsample", "unary"),
        num_points=(2048, 512, 128),
        conv_neighbors=(16, 16, 16),
        pool_neighbors=(16, 16),
        in_radius=1.0,
        first_subsampling_dl=0.06,
        in_features_dim=2,
    )
    scenes = [synthetic.make_scene(seed=0, num_points=20000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    out = calibrate_budgets(ds, num_spheres=6)
    assert len(out["num_points"]) == 3
    assert len(out["conv_neighbors"]) == 3
    assert len(out["pool_neighbors"]) == 2
    # budgets shrink with depth, neighbor counts are plausible
    assert out["num_points"][0] > out["num_points"][1] > out["num_points"][2] > 0
    assert all(2 <= k <= 256 for k in out["conv_neighbors"])
    assert out["num_points"][0] % 256 == 0
    # the calibrated config is usable
    cfg2 = cfg.replace(**out)
    spec = cfg2.pyramid_spec()
    assert spec.num_points == out["num_points"]
