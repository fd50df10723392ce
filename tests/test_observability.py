"""Observability artifacts: scalar JSONL, per-class IoU log, PLY dumps,
2D prediction panels (reference: trainer.py:445-517, tester.py:320-365,
train_2d.py:112-117,209-228)."""

import json

import numpy as np

from mvkpconv_tpu.training.logger import ScalarLog, ValIoULog


def test_scalar_jsonl_and_val_ious(tmp_path):
    s = ScalarLog(tmp_path)
    s.log(10, loss=1.5, accuracy=0.25)
    s.log(20, loss=1.0)
    rows = [json.loads(l) for l in (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert rows[0] == {"step": 10, "tag": "loss", "value": 1.5}
    assert {r["tag"] for r in rows} == {"loss", "accuracy"}

    v = ValIoULog(tmp_path)
    v.append(np.array([0.5, 0.25, 1.0]))
    v.append([0.1, 0.2, 0.3])
    lines = (tmp_path / "val_IoUs.txt").read_text().splitlines()
    assert len(lines) == 2
    assert [float(x) for x in lines[0].split()] == [0.5, 0.25, 1.0]


def test_save_2d_panel(tmp_path, rng):
    from PIL import Image

    from mvkpconv_tpu.utils.visualize import save_2d_panel

    h, w = 24, 32
    img = rng.rand(h, w, 3).astype(np.float32)
    gt = rng.randint(-1, 20, (h, w))
    pred = rng.randint(0, 20, (h, w))
    save_2d_panel(tmp_path / "p.png", img, gt, pred)
    loaded = np.asarray(Image.open(tmp_path / "p.png"))
    assert loaded.shape == (h, 3 * w, 3)


def test_voting_save_artifacts(tmp_path, rng):
    from mvkpconv_tpu.data import SphereDataset, synthetic
    from mvkpconv_tpu.eval import VotingTester
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.utils.ply import read_ply

    cfg = KPConfig(
        fusion="none", in_features_dim=5,
        architecture=("simple", "resnetb_strided", "resnetb",
                      "nearest_upsample", "unary"),
        num_points=(512, 128), conv_neighbors=(12, 12), pool_neighbors=(12,),
        batch_num=2, num_views=0,
    )
    scenes = [synthetic.make_scene(seed=i, num_points=4000) for i in range(2)]
    ds = SphereDataset(scenes, cfg, training=False)

    def predict(batch):
        n = batch["points"].shape[1]
        return rng.rand(batch["points"].shape[0], n, cfg.num_classes)

    tester = VotingTester(ds, predict, cfg.num_classes, num_votes=0.5)
    tester.run(max_batches=4)
    from mvkpconv_tpu.data.meta import CLASS_NAMES

    tester.save_artifacts(tmp_path / "preds", html=True,
                          class_names=CLASS_NAMES)
    plys = sorted((tmp_path / "preds").glob("*.ply"))
    assert len(plys) == 4  # 2 scenes × (pred + potentials)
    data = read_ply(next(p for p in plys if "pred" in p.name))
    for field in ("x", "pred", "gt", "error", "red"):
        assert field in data
    htmls = sorted((tmp_path / "preds").glob("*_viewer.html"))
    assert len(htmls) == 2


def test_html_viewer_roundtrip(tmp_path, rng):
    """The standalone viewer must embed the exact (centered/scaled) cloud:
    decode the base64 payloads back out of the HTML and check counts,
    dtype widths, legend entries, and the renderer scaffolding."""
    import base64
    import re

    from mvkpconv_tpu.data.meta import CLASS_NAMES
    from mvkpconv_tpu.utils.html_viewer import save_html_viewer

    pts = rng.rand(1000, 3).astype(np.float32)
    labels = rng.randint(0, 5, 1000)
    overlay = rng.rand(30, 3).astype(np.float32)
    red = np.tile(np.array([[255, 0, 0]], np.uint8), (30, 1))
    out = save_html_viewer(
        tmp_path / "v.html",
        [
            {"name": "scene", "points": pts, "labels": labels},
            {"name": "overlay", "points": overlay, "colors": red,
             "size": 3.0, "on": False},
        ],
        class_names=CLASS_NAMES,
        title="roundtrip",
    )
    html = out.read_text()
    assert "<canvas" in html and "zbuf" in html  # renderer scaffolding
    meta = json.loads(re.search(r"const META = (\{.*?\});\n", html).group(1))
    assert [c["name"] for c in meta["clouds"]] == ["scene", "overlay"]
    xyz = np.frombuffer(base64.b64decode(meta["clouds"][0]["xyz"]), np.float32)
    rgb = np.frombuffer(base64.b64decode(meta["clouds"][0]["rgb"]), np.uint8)
    assert xyz.shape == (3000,) and rgb.shape == (3000,)
    assert np.abs(xyz).max() <= 1.0 + 1e-5  # centered + scaled
    ov = np.frombuffer(base64.b64decode(meta["clouds"][1]["rgb"]), np.uint8)
    assert (ov.reshape(-1, 3) == red).all()
    assert meta["clouds"][1]["on"] is False
    legend_names = {e[0] for e in meta["legend"]}
    assert legend_names == set(CLASS_NAMES[:5])

    # subsampling bound honored
    big = save_html_viewer(
        tmp_path / "big.html",
        [{"name": "s", "points": rng.rand(5000, 3), "labels": np.zeros(5000, int)}],
        max_points=1200,
    )
    meta2 = json.loads(re.search(r"const META = (\{.*?\});\n", big.read_text()).group(1))
    assert len(base64.b64decode(meta2["clouds"][0]["xyz"])) == 1200 * 12
