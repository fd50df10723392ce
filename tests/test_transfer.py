"""Pretrained-2D checkpoint transfer into the fusion model (path_2D flow)."""

import numpy as np

import jax
import jax.numpy as jnp

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

def test_train2d_then_fusion_with_path2d(tmp_path):
    from flax import serialization as ser

    from mvkpconv_tpu.tools import train_2d, train_scannet

    cfgp = tmp_path / "params.txt"
    KPConfig(**TINY).save(cfgp)
    run2d = str(tmp_path / "run2d")
    train_2d.main([
        "--data", "synthetic:1", "--val-data", "synthetic:1",
        "--config", str(cfgp), "--output", run2d, "--steps", "2",
    ])

    cfgf = tmp_path / "params_fusion.txt"
    KPConfig(**{**TINY, "fusion": "early", "in_features_dim": 66}).save(cfgf)
    out = str(tmp_path / "fusion")
    train_scannet.main([
        "--fusion", "early", "--data", "synthetic:1", "--val-data", "synthetic:1",
        "--config", str(cfgf), "--output", out, "--steps", "1",
        "--path-2d", run2d,
    ])

    # the fusion checkpoint's net_2d must equal the 2D run's params (frozen
    # through the fusion step, so still identical after 1 step)
    from pathlib import Path

    raw_2d = ser.msgpack_restore(
        sorted(Path(run2d, "checkpoints").glob("ckpt_*.msgpack"))[-1].read_bytes()
    )
    raw_f = ser.msgpack_restore(
        sorted(Path(out, "checkpoints").glob("ckpt_*.msgpack"))[-1].read_bytes()
    )
    a = jax.tree_util.tree_leaves(raw_2d["params"])
    b = jax.tree_util.tree_leaves(raw_f["params"]["net_2d"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x).ravel(), np.asarray(y).ravel())
