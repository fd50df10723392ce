"""CLI entry-point smoke tests (tiny configs, end-to-end train→test)."""

import time

import numpy as np
import pytest

from mvkpconv_tpu.training.config import KPConfig

TINY = dict(
    architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
    num_points=(256, 64),
    conv_neighbors=(8, 8),
    pool_neighbors=(8,),
    first_features_dim=16,
    first_subsampling_dl=0.1,
    in_radius=1.0,
    batch_num=2,
    epoch_steps=2,
    validation_size=2,
    num_views=2,
    image_height=24,
    image_width=32,
)



import pytest as _pytest

pytestmark = _pytest.mark.slow

def _write_cfg(tmp_path, **kw):
    cfg = KPConfig(**{**TINY, **kw})
    p = tmp_path / "params.txt"
    cfg.save(p)
    return str(p)


def test_train_and_test_baseline_cli(tmp_path):
    from mvkpconv_tpu.tools import test_models, train_scannet

    cfgp = _write_cfg(tmp_path, in_features_dim=2)
    out = str(tmp_path / "run")
    train_scannet.main([
        "--fusion", "none", "--data", "synthetic:1", "--val-data", "synthetic:1",
        "--config", cfgp, "--output", out, "--steps", "2",
    ])
    assert (tmp_path / "run" / "training.txt").exists()
    assert (tmp_path / "run" / "checkpoints" / "last_checkpoint").exists()
    test_models.main([
        "--run", out, "--data", "synthetic:1", "--votes", "0.5",
    ])


def test_train_fusion_cli(tmp_path):
    from mvkpconv_tpu.tools import train_scannet

    cfgp = _write_cfg(tmp_path, in_features_dim=66, fusion="early")
    out = str(tmp_path / "fusion_run")
    train_scannet.main([
        "--fusion", "early", "--data", "synthetic:1", "--val-data", "synthetic:1",
        "--config", cfgp, "--output", out, "--steps", "2",
    ])
    assert (tmp_path / "fusion_run" / "checkpoints" / "last_checkpoint").exists()


def test_train_2d_cli(tmp_path):
    import json

    from mvkpconv_tpu.tools import test_2d, train_2d

    cfgp = _write_cfg(tmp_path)
    train_2d.main([
        "--data", "synthetic:1", "--val-data", "synthetic:1", "--config", cfgp,
        "--output", str(tmp_path / "run2d"), "--steps", "2",
    ])
    assert (tmp_path / "run2d" / "checkpoints" / "last_checkpoint").exists()

    # standalone 2D eval CLI (mvpnet/test_2d.py parity): scoring the saved
    # checkpoint over the same full frame set must REPRODUCE the miou the
    # trainer's in-loop eval computed for that state (one code path)
    ev = test_2d.main([
        "--run", str(tmp_path / "run2d"), "--data", "synthetic:1",
    ])
    assert (tmp_path / "run2d" / "test_2d_IoUs.txt").exists()
    val_mious = [
        rec["value"]
        for l in (tmp_path / "run2d" / "scalars.jsonl").read_text().splitlines()
        if (rec := json.loads(l))["tag"] == "val_miou"
    ]
    assert val_mious, "trainer logged no val_miou"
    np.testing.assert_allclose(ev.miou, val_mious[-1], atol=1e-6)


def test_train_and_test_mvpnet_cli(tmp_path):
    from mvkpconv_tpu.tools import test_mvpnet, train_mvpnet

    cfgp = _write_cfg(tmp_path)
    out = str(tmp_path / "mvp")
    train_mvpnet.main([
        "--data", "synthetic:1", "--val-data", "synthetic:1", "--config", cfgp,
        "--output", out, "--steps", "2", "--num-points", "512", "--num-views", "2",
    ])
    assert (tmp_path / "mvp" / "checkpoints" / "last_checkpoint").exists()
    test_mvpnet.main([
        "--run", out, "--data", "synthetic:1", "--num-points", "512",
        "--num-views", "2", "--stride", "2.0",
    ])


def test_preprocess_cli(tmp_path, rng):
    from mvkpconv_tpu.tools import preprocess
    from mvkpconv_tpu.utils.ply import write_ply

    scan = tmp_path / "scene0001_00"
    scan.mkdir()
    pts = rng.rand(60, 3).astype(np.float32)
    cols = (rng.rand(60, 3) * 255).astype(np.uint8)
    write_ply(scan / "scene0001_00_vh_clean_2.ply", [pts, cols],
              ["x", "y", "z", "red", "green", "blue"])
    nyu = rng.choice([1, 2, 4], 60).astype(np.uint16)
    write_ply(scan / "scene0001_00_vh_clean_2.labels.ply", [pts, nyu],
              ["x", "y", "z", "label"])
    split = tmp_path / "split.txt"
    split.write_text("scene0001_00\n")
    preprocess.main([
        "--scans", str(tmp_path), "--split-file", str(split),
        "--output", str(tmp_path / "out.pkl"),
        "--weights-output", str(tmp_path / "w.txt"),
    ])
    assert (tmp_path / "out.pkl").exists()
    w = np.loadtxt(tmp_path / "w.txt")
    assert w.shape == (20,)


def test_measure_variants_two_stage_tiny(tmp_path):
    """The two-stage protocol wiring (pretrain 2D once -> inject frozen into
    fusion + mvpnet variants) end-to-end at CI shapes."""
    import json

    from mvkpconv_tpu.tools import measure_variants

    measure_variants.main([
        "--tiny", "--steps", "2", "--steps-2d", "2",
        "--train-scenes", "1", "--val-scenes", "1",
        "--only", "kpconv_baseline,mvkpconv_early,mvpnet",
        "--out", str(tmp_path),
    ])
    res = json.loads((tmp_path / "results.json").read_text())
    assert set(res) == {"kpconv_baseline", "mvkpconv_early", "mvpnet"}
    # --only preserves the caller's ordering (long budgets put the
    # highest-value rows first)
    assert list(res) == ["kpconv_baseline", "mvkpconv_early", "mvpnet"]
    assert res["kpconv_baseline"]["protocol"] == "3d_only"
    assert res["mvkpconv_early"]["protocol"] == "two_stage_frozen_2d"
    assert res["mvpnet"]["protocol"] == "two_stage_frozen_2d"

    # resume path: reuse the saved 2D net via --path-2d for an mvpnet-only
    # run (regression: this used to silently fall back to joint 2D
    # training because vars_2d was None and fusion_needed ignored mvpnet)
    out2 = tmp_path / "resume"
    measure_variants.main([
        "--tiny", "--steps", "2",
        "--train-scenes", "1", "--val-scenes", "1",
        "--only", "mvpnet",
        "--path-2d", str(tmp_path / "net_2d"),
        "--out", str(out2),
    ])
    res2 = json.loads((out2 / "results.json").read_text())
    assert res2["mvpnet"]["protocol"] == "two_stage_frozen_2d"

    # variant-level resume: rerunning into the same --out must SKIP rows
    # already in results.json (outage-interrupted matrices resume where
    # they stopped) while keeping the earlier rows in the merged file
    t0 = time.time()
    measure_variants.main([
        "--tiny", "--steps", "2", "--steps-2d", "2",
        "--train-scenes", "1", "--val-scenes", "1",
        "--only", "kpconv_baseline,mvkpconv_early,mvpnet",
        "--out", str(tmp_path),
    ])
    assert time.time() - t0 < 30, "skip-resume should not retrain anything"
    res3 = json.loads((tmp_path / "results.json").read_text())
    assert res3 == res


def test_inspect_deform_cli(tmp_path):
    from mvkpconv_tpu.tools import inspect_deform

    inspect_deform.main([
        "--data", "synthetic:1", "--output", str(tmp_path / "deform"),
    ])
    out = tmp_path / "deform"
    assert (out / "deform_stats.json").exists()
    assert list(out.glob("deform_layer*.ply"))
