"""Deformable-kernel inspection artifacts (eval/deform_inspect.py) — the
headless counterpart of the reference's mayavi inspector
(KPConv-PyTorch/utils/visualizer.py)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.eval.deform_inspect import (
    collect_deform_layers,
    deform_stats,
    inspect_deformable,
)
from mvkpconv_tpu.models import KPFCNN
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.utils.ply import read_ply

DEFORM_ARCH = (
    "simple",
    "resnetb",
    "resnetb_deformable_strided",
    "resnetb_deformable",
    "nearest_upsample",
    "unary",
)


def _cfg():
    return KPConfig(
        architecture=DEFORM_ARCH,
        num_points=(256, 64),
        conv_neighbors=(10, 10),
        pool_neighbors=(10,),
        first_features_dim=16,
        first_subsampling_dl=0.1,
        in_radius=1.0,
        in_features_dim=2,
        num_classes=8,
        batch_num=2,
    )


def test_inspect_deformable_writes_plys_and_stats(tmp_path):
    cfg = _cfg()
    scenes = [synthetic.make_scene(seed=0, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    batch = device_batch(ds.sample_batch())
    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]),
        cfg.pyramid_spec(),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr
    )

    summary = inspect_deformable(model, variables, batch, cfg, tmp_path)
    # two deformable blocks -> two layers, two PLYs
    assert len(summary["layers"]) == 2
    assert len(summary["plys"]) == 2
    st = summary["layers"]
    # strided deform block queries level 1, plain deform block level 1 too
    assert [s["level"] for s in st] == [1, 1]
    for s in st:
        assert 0.0 <= s["fit_fraction"] <= 1.0
        assert np.isfinite(s["mean_kp_radius"])
    # stats JSON exists and parses
    loaded = json.loads((tmp_path / "deform_stats.json").read_text())
    assert loaded["layers"] == st

    # PLY round-trips with the expected fields; kernel rows near their query
    ply = read_ply(summary["plys"][0])
    for f in ("x", "y", "z", "red", "kind", "query_id", "kp_id", "min_d2"):
        assert f in ply
    kind = ply["kind"]
    assert (kind == 0).any() and (kind == 1).any()
    m = cfg.num_kernel_points
    assert (kind == 1).sum() % m == 0
    # deformed kernel points sit within a few extents of their query point
    _, _, _, r, layer = "x", "y", "z", None, None
    qid = ply["query_id"][kind == 1]
    kp_xyz = np.stack([ply["x"], ply["y"], ply["z"]], -1)[kind == 1]
    q_pts = np.asarray(pyr.points[1])[0]
    d = np.linalg.norm(kp_xyz - q_pts[qid], axis=-1)
    extent = st[0]["extent"]
    assert float(d.max()) < 20 * extent  # fresh-init offsets are small


def test_collect_requires_intermediates():
    cfg = _cfg()
    scenes = [synthetic.make_scene(seed=1, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    batch = device_batch(ds.sample_batch())
    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]),
        cfg.pyramid_spec(),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr
    )
    _, state = model.apply(
        variables, jnp.asarray(batch["features"]), pyr, train=False,
        mutable=["intermediates"],
    )
    layers = collect_deform_layers(state["intermediates"], cfg, pyr)
    stats = deform_stats(layers)
    assert len(layers) == len(stats) == 2
    # empty intermediates -> clear error
    try:
        collect_deform_layers({}, cfg, pyr)
    except ValueError as e:
        assert "mutable" in str(e)
    else:
        raise AssertionError("expected ValueError on empty intermediates")
