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
    tester.save_artifacts(tmp_path / "preds")
    plys = sorted((tmp_path / "preds").glob("*.ply"))
    assert len(plys) == 4  # 2 scenes × (pred + potentials)
    data = read_ply(next(p for p in plys if "pred" in p.name))
    for field in ("x", "pred", "gt", "error", "red"):
        assert field in data
