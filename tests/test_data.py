"""Data pipeline tests: synthetic scenes, rendering geometry, sphere sampling."""

import numpy as np
import pytest

from mvkpconv_tpu.data import SphereDataset, assemble_features, synthetic
from mvkpconv_tpu.data.spheres import grid_subsample_np
from mvkpconv_tpu.ops.common import SHADOW_COORD
from mvkpconv_tpu.training.config import KPConfig


def small_cfg(**kw):
    base = dict(
        num_points=(1024, 256),
        conv_neighbors=(12, 12),
        pool_neighbors=(12,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.0,
        first_subsampling_dl=0.06,
        in_features_dim=2,
        fusion="none",
        num_views=3,
        image_height=24,
        image_width=32,
        batch_num=2,
    )
    base.update(kw)
    return KPConfig(**base)


def test_make_scene_labels_and_shapes():
    scene = synthetic.make_scene(seed=1, num_points=5000)
    assert scene["points"].shape == scene["colors"].shape
    labs = scene["labels"]
    assert labs.min() >= -1 and labs.max() < 20
    assert (labs == -1).any()  # some ignore labels
    assert {0, 1} <= set(labs[labs >= 0].tolist())  # walls + floor present


def test_make_scene_curved_family():
    """Curved family (VERDICT r4 #5): class identity carried by curvature —
    cylinders(2) / spherical shells(4) / arches(7) / tilted cylinders(19)
    all present, geometry actually curved (cylinder radii exact)."""
    scene = synthetic.make_scene(seed=1, num_points=20000, family="curved")
    labs = scene["labels"]
    assert {0, 1, 2, 4, 7, 19} <= set(labs[labs >= 0].tolist())
    # the exact-surface helpers: every generated point sits ON the shell
    rng = np.random.RandomState(0)
    cyl = synthetic._cylinder_points(rng, radius=0.3, height=1.0, n=500)
    np.testing.assert_allclose(np.hypot(cyl[:, 0], cyl[:, 1]), 0.3, atol=1e-6)
    assert np.abs(cyl[:, 2]).max() <= 0.5 + 1e-6
    sph = synthetic._sphere_shell_points(rng, radius=0.4, n=500)
    np.testing.assert_allclose(np.linalg.norm(sph, axis=1), 0.4, atol=1e-6)
    arch = synthetic._arch_points(rng, major=0.6, minor=0.1, n=500)
    # torus equation: (sqrt(x²+z²) − major)² + y² == minor²
    ring = np.hypot(arch[:, 0], arch[:, 2])
    np.testing.assert_allclose(
        np.hypot(ring - 0.6, arch[:, 1]), 0.1, atol=1e-6
    )
    assert arch[:, 2].min() >= -0.1 - 1e-6  # feet at the floor, not below
    with pytest.raises(ValueError):
        synthetic.make_scene(seed=0, num_points=100, family="nope")


def test_load_scenes_curved_spec():
    from mvkpconv_tpu.tools.common import load_scenes

    scenes = load_scenes("synthetic-curved:1", False, 2, (24, 32))
    labs = scenes[0]["labels"]
    assert {2, 4, 7, 19} <= set(labs[labs >= 0].tolist())


def test_render_views_geometry_consistency():
    """Unprojecting rendered depth must land back on scene surfaces."""
    scene = synthetic.make_scene(seed=2, num_points=30000)
    views = synthetic.render_views(scene, num_views=2, h=60, w=80, seed=2)
    depth, K, poses = views["depth"], views["intrinsics"], views["poses"]
    assert (depth >= 0).all() and (depth > 0).mean() > 0.3
    v = 0
    ys, xs = np.nonzero(depth[v] > 0)
    sel = slice(0, len(ys), max(len(ys) // 200, 1))
    ys, xs = ys[sel], xs[sel]
    z = depth[v, ys, xs]
    x = (xs - K[v, 0, 2]) * z / K[v, 0, 0]
    y = (ys - K[v, 1, 2]) * z / K[v, 1, 1]
    cam = np.stack([x, y, z], 1)
    world = cam @ poses[v, :3, :3].T + poses[v, :3, 3]
    # each unprojected pixel is close to some scene point
    from scipy.spatial import cKDTree

    d, _ = cKDTree(scene["points"]).query(world)
    assert np.median(d) < 0.05


def test_grid_subsample_np_matches_device_op(rng):
    import jax.numpy as jnp

    from mvkpconv_tpu.ops import grid_subsample

    pts = rng.rand(2000, 3).astype(np.float32) * 3
    cols = rng.rand(2000, 3).astype(np.float32)
    labs = rng.randint(-1, 20, 2000).astype(np.int32)
    p_np, c_np, l_np = grid_subsample_np(pts, cols, labs, 0.25)
    res = grid_subsample(
        jnp.asarray(pts), 0.25, max_out=2000, features=jnp.asarray(cols),
        labels=jnp.asarray(labs), num_classes=20,
    )
    m = np.asarray(res.mask)
    assert m.sum() == len(p_np)
    got = np.asarray(res.points)[m]
    order_a = np.lexsort(p_np.T)
    order_b = np.lexsort(got.T)
    np.testing.assert_allclose(got[order_b], p_np[order_a], atol=1e-4)


def test_assemble_features_dims(rng):
    pts = rng.rand(10, 3).astype(np.float32)
    cols = rng.rand(10, 3).astype(np.float32)
    for d in (1, 2, 4, 5, 7):
        f = assemble_features(pts, cols, d, True)
        assert f.shape == (10, d)
        assert (f[:, 0] == 1).all()
    with pytest.raises(ValueError):
        assemble_features(pts, cols, 3, True)


def test_sphere_dataset_batches():
    cfg = small_cfg()
    scenes = [synthetic.make_scene(seed=s, num_points=20000) for s in range(2)]
    ds = SphereDataset(scenes, cfg, training=True, seed=0)
    batch = ds.sample_batch()
    n0 = cfg.num_points[0]
    assert batch["points"].shape == (2, n0, 3)
    assert batch["mask"].shape == (2, n0)
    assert batch["features"].shape == (2, n0, 2)
    assert batch["labels"].shape == (2, n0)
    # padded slots are shadowed + ignored
    for b in range(2):
        inv = ~batch["mask"][b]
        assert (batch["points"][b][inv] == SHADOW_COORD).all()
        assert (batch["labels"][b][inv] == cfg.ignore_label).all()
    # sphere is centered: valid points within in_radius-ish (augmented)
    valid = batch["points"][batch["mask"]]
    assert np.linalg.norm(valid, axis=1).max() < cfg.in_radius * 1.3


def test_sphere_dataset_potentials_spread_coverage():
    cfg = small_cfg()
    scenes = [synthetic.make_scene(seed=3, num_points=20000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    centers = [ds.sample_sphere()["center"] for _ in range(12)]
    centers = np.stack(centers)
    d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    # potential mechanism must not resample the same spot repeatedly
    assert np.median(d.min(1)) > 0.2
    assert ds.min_potential() > 0


def test_sphere_dataset_with_views():
    cfg = small_cfg(fusion="early", in_features_dim=66)
    scene = synthetic.make_scene(seed=4, num_points=30000)
    scene.update(
        {
            "rgb": synthetic.render_views(scene, 6, 24, 32, seed=4)["rgb"],
            **{
                k: v
                for k, v in synthetic.render_views(scene, 6, 24, 32, seed=4).items()
                if k != "rgb"
            },
        }
    )
    ds = SphereDataset([scene], cfg, training=True, seed=0)
    batch = ds.sample_batch()
    v, h, w = cfg.num_views, 24, 32
    assert batch["images"].shape == (2, v, h, w, 3)
    assert batch["depth"].shape == (2, v, h, w)
    assert batch["poses"].shape == (2, v, 4, 4)
    assert batch["features"].shape[-1] == 2  # 66 - 64


def test_inspect_dataset_flags_miscalibrated_budget(tmp_path):
    """tools/inspect_dataset must flag a deliberately starved neighbor
    budget and pass a generous one (the reference's
    debug_batch_and_neighbors_calib role, ScanNet_sphere_color.py:1694+)."""
    from mvkpconv_tpu.tools import inspect_dataset

    bad = small_cfg(conv_neighbors=(2, 2), pool_neighbors=(2,))
    p = tmp_path / "bad.txt"
    bad.save(p)
    report = inspect_dataset.main([
        "--data", "synthetic:1", "--config", str(p),
        "--spheres", "4", "--output", str(tmp_path / "bad_out"),
    ])
    conv0 = next(r for r in report["budgets"]
                 if r["kind"] == "conv" and r["level"] == 0)
    assert not conv0["ok"] and conv0["truncation_rate"] > 0.1
    assert (tmp_path / "bad_out" / "inspect_dataset.json").exists()
    with pytest.raises(SystemExit):
        inspect_dataset.main([
            "--data", "synthetic:1", "--config", str(p), "--strict",
            "--spheres", "4", "--output", str(tmp_path / "bad_out2"),
        ])

    good = small_cfg(conv_neighbors=(60, 60), pool_neighbors=(60,))
    p2 = tmp_path / "good.txt"
    good.save(p2)
    report2 = inspect_dataset.main([
        "--data", "synthetic:1", "--config", str(p2), "--max-headroom", "100",
        "--spheres", "4", "--output", str(tmp_path / "good_out"),
    ])
    assert all(r["ok"] for r in report2["budgets"])
    # timing + occupancy sections populated from the real sampling path
    assert report2["stage_ms"].get("crop", 0) > 0
    assert 0 <= report2["sphere_counts"]["padding_fraction"] <= 1


def test_prefetch_iterator_order_and_errors():
    from mvkpconv_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch(boom(), depth=1)
    assert next(it) == 1
    import pytest as _p
    with _p.raises(RuntimeError, match="producer died"):
        next(it)
