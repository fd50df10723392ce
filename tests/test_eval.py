"""Evaluator + voting tester tests."""

import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.eval import Evaluator, VotingTester
from mvkpconv_tpu.eval.voting import validation_sweep
from mvkpconv_tpu.training.config import KPConfig


def test_evaluator_perfect_and_table():
    ev = Evaluator()
    labels = np.array([0, 1, 2, 19, -1])
    ev.update(labels, labels)
    assert ev.overall_accuracy == 1.0
    assert ev.miou == 1.0  # absent classes take present-class mIoU
    assert "mean\t1.0000" in ev.table()


def test_evaluator_confusion_counts():
    ev = Evaluator()
    ev.update(np.array([0, 0, 1]), np.array([0, 1, 1]))
    assert ev.confusion[0, 0] == 1 and ev.confusion[1, 0] == 1 and ev.confusion[1, 1] == 1
    # iou class0: tp=1, fp=1, fn=0 -> 0.5 ; class1: tp=1, fp=0, fn=1 -> 0.5
    np.testing.assert_allclose(ev.class_iou[:2], [0.5, 0.5])


def _oracle_predictor(ds, cfg):
    """Cheating predictor that reads labels — isolates the voting plumbing."""

    def predict(batch):
        labels = batch["labels"]
        onehot = np.eye(cfg.num_classes, dtype=np.float32)[np.clip(labels, 0, None)]
        onehot[labels < 0] = 1.0 / cfg.num_classes
        return onehot

    return predict


def test_voting_tester_with_oracle_reaches_high_miou():
    cfg = KPConfig(
        num_points=(512, 128),
        conv_neighbors=(10, 10),
        pool_neighbors=(10,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.2,
        first_subsampling_dl=0.08,
        in_features_dim=2,
        batch_num=4,
        num_classes=20,
    )
    scenes = [synthetic.make_scene(seed=0, num_points=12000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    tester = VotingTester(ds, _oracle_predictor(ds, cfg), cfg.num_classes, num_votes=3.0)
    ev = tester.run(max_batches=200)
    cov = [(p.sum(-1) > 0).mean() for p in tester.probs]
    assert cov[0] > 0.9, f"vote sweep covered only {cov[0]:.2%} of the cloud"
    assert ev.miou > 0.9, ev.table()
    # full-res reprojection also works
    ev_full = tester.score_reprojected(scenes)
    assert ev_full.miou > 0.75


def test_validation_sweep_returns_miou():
    cfg = KPConfig(
        num_points=(256, 64),
        conv_neighbors=(8, 8),
        pool_neighbors=(8,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.0,
        first_subsampling_dl=0.1,
        in_features_dim=2,
        batch_num=2,
        num_classes=20,
    )
    scenes = [synthetic.make_scene(seed=1, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    out = validation_sweep(ds, _oracle_predictor(ds, cfg), cfg.num_classes, num_batches=5)
    assert 0.0 <= out["miou"] <= 1.0
    assert out["class_iou"].shape == (20,)


def test_evaluate_labels_cli(tmp_path, rng, capsys):
    """Standalone benchmark-style evaluator (evaluate_3d.py:95-160)."""
    from mvkpconv_tpu.tools.evaluate_labels import main

    pred_d = tmp_path / "pred"; gt_d = tmp_path / "gt"
    pred_d.mkdir(); gt_d.mkdir()
    for scan in ("scene0", "scene1"):
        gt = rng.randint(0, 5, 200)
        pred = gt.copy()
        flip = rng.rand(200) < 0.2
        pred[flip] = (pred[flip] + 1) % 5
        np.savetxt(pred_d / f"{scan}.txt", pred, fmt="%d")
        np.savetxt(gt_d / f"{scan}.txt", gt, fmt="%d")
    main(["--pred-path", str(pred_d), "--gt-path", str(gt_d),
          "--num-classes", "5"])
    out = capsys.readouterr().out
    assert "mIoU" in out or "mean" in out.lower()
    assert "scored scene0.txt" in out
