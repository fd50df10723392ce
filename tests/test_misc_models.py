"""KPCNN classification, 3D-only PN2 baseline CLI, convergence tool."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import KPCNN
from mvkpconv_tpu.ops import masked_points
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig


def test_kpcnn_classification_forward(rng):
    cfg = KPConfig(
        architecture=("simple", "resnetb_strided", "resnetb", "global_average"),
        num_points=(256, 64),
        conv_neighbors=(8, 8),
        pool_neighbors=(8,),
        first_features_dim=16,
        first_subsampling_dl=0.1,
        in_features_dim=1,
        num_classes=10,
    )
    pts = rng.rand(2, 256, 3).astype(np.float32)
    mask = np.ones((2, 256), bool)
    mask[:, -20:] = False
    pts = masked_points(jnp.asarray(pts), jnp.asarray(mask))
    pyr = build_pyramid(pts, jnp.asarray(mask), cfg.pyramid_spec())
    feats = jnp.ones((2, 256, 1))
    model = KPCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, pyr)
    logits = model.apply(variables, feats, pyr)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_pn2_baseline_cli(tmp_path):
    from mvkpconv_tpu.tools import train_mvpnet

    cfgp = tmp_path / "params.txt"
    KPConfig(batch_num=2, epoch_steps=2, validation_size=2, num_views=2,
             image_height=24, image_width=32).save(cfgp)
    out = str(tmp_path / "pn2run")
    train_mvpnet.main([
        "--data", "synthetic:1", "--val-data", "synthetic:1",
        "--config", str(cfgp), "--output", out, "--steps", "2",
        "--num-points", "512", "--no-images",
    ])
    assert (tmp_path / "pn2run" / "checkpoints" / "last_checkpoint").exists()


def test_plot_convergence_tool(tmp_path, capsys):
    from mvkpconv_tpu.tools import plot_convergence

    run = tmp_path / "run"
    run.mkdir()
    lines = ["epochs steps out_loss offset_loss train_accuracy time"]
    for s in range(30):
        lines.append(f"0 {s+1} {3.0 - 0.05*s:.3f} 0.000 {0.2 + 0.02*s:.3f} {s*0.5:.1f}")
    (run / "training.txt").write_text("\n".join(lines) + "\n")
    plot_convergence.main([str(run), "--output", str(tmp_path / "c.png")])
    out = capsys.readouterr().out
    assert "30 steps" in out
    assert (tmp_path / "c.png").exists()
