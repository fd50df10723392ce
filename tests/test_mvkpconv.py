"""MV-KPConv fusion variant tests (early / middle / late)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops import masked_points, unproject_depth
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig

TINY_ARCH = (
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "nearest_upsample",
    "unary",
)


def fusion_config(fusion):
    return KPConfig(
        architecture=TINY_ARCH,
        num_classes=5,
        in_features_dim=66,  # 64 + 1 + z
        feature_2d_dim=64,
        first_features_dim=16,
        first_subsampling_dl=0.1,
        num_points=(128, 32),
        conv_neighbors=(12, 12),
        pool_neighbors=(12,),
        fusion=fusion,
        num_views=2,
        image_height=24,
        image_width=32,
    )


def make_batch(rng, cfg, b=1, with_raw_geometry=False):
    n0 = cfg.num_points[0]
    v, h, w = cfg.num_views, cfg.image_height, cfg.image_width
    pts = rng.rand(b, n0, 3).astype(np.float32)
    mask = np.ones((b, n0), bool)
    mask[:, -10:] = False
    pts = masked_points(jnp.asarray(pts), jnp.asarray(mask))
    pyr = build_pyramid(pts, jnp.asarray(mask), cfg.pyramid_spec())
    base_dim = cfg.in_features_dim - cfg.feature_2d_dim
    batch = {
        "features": jnp.asarray(rng.randn(b, n0, base_dim).astype(np.float32)),
        "images": jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32)),
    }
    if with_raw_geometry:
        depth = rng.rand(b, v, h, w).astype(np.float32) * 3.0
        depth[:, :, :2] = 0.0  # some invalid pixels
        K = np.zeros((b, v, 3, 3), np.float32)
        K[..., 0, 0] = K[..., 1, 1] = 20.0
        K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = w / 2, h / 2, 1.0
        poses = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
        batch |= {
            "depth": jnp.asarray(depth),
            "intrinsics": jnp.asarray(K),
            "poses": jnp.asarray(poses),
        }
    else:
        batch |= {
            "image_xyz": jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32)),
            "knn_indices": jnp.asarray(
                rng.randint(0, v * h * w, size=(b, n0, cfg.pixel_knn)).astype(np.int32)
            ),
        }
    return batch, pyr


@pytest.mark.parametrize("fusion", ["early", "middle", "late"])
def test_mvkpconv_fusion_forward(rng, fusion):
    cfg = fusion_config(fusion)
    batch, pyr = make_batch(rng, cfg)
    model = MVKPConv(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, pyr)
    logits = model.apply(variables, batch, pyr)
    assert logits.shape == (1, cfg.num_points[0], cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_mvkpconv_on_device_unprojection(rng):
    cfg = fusion_config("early")
    batch, pyr = make_batch(rng, cfg, with_raw_geometry=True)
    model = MVKPConv(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, pyr)
    logits = model.apply(variables, batch, pyr)
    assert logits.shape == (1, cfg.num_points[0], cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_unproject_depth_geometry():
    """Pinhole round trip: a pixel at the principal point maps to (0,0,z)."""
    depth = jnp.full((1, 1, 4, 6), 2.0)
    K = jnp.asarray([[[[10.0, 0, 3.0], [0, 10.0, 2.0], [0, 0, 1]]]])
    pose = jnp.tile(jnp.eye(4)[None, None], (1, 1, 1, 1))
    xyz, valid = unproject_depth(depth, K, pose)
    np.testing.assert_allclose(np.asarray(xyz[0, 0, 2, 3]), [0, 0, 2.0], atol=1e-6)
    # pixel (u=5, v=0): x=(5-3)*2/10=0.4, y=(0-2)*2/10=-0.4
    np.testing.assert_allclose(np.asarray(xyz[0, 0, 0, 5]), [0.4, -0.4, 2.0], atol=1e-6)
    assert bool(valid.all())
    # invalid depth → shadow
    xyz2, valid2 = unproject_depth(depth.at[0, 0, 1, 1].set(0.0), K, pose)
    assert not bool(valid2[0, 0, 1, 1])
    assert float(xyz2[0, 0, 1, 1, 0]) == 1e6


@pytest.mark.slow
def test_mvkpconv_frozen_2d(rng):
    cfg = fusion_config("late")
    batch, pyr = make_batch(rng, cfg)
    model = MVKPConv(cfg, freeze_2d=True)
    variables = model.init(jax.random.PRNGKey(0), batch, pyr)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, batch, pyr
        )
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    assert all(
        float(jnp.abs(x).max()) == 0.0
        for x in jax.tree_util.tree_leaves(g["net_2d"])
    )
    assert max(
        float(jnp.abs(x).max())
        for x in jax.tree_util.tree_leaves(g["encoder"])
    ) > 0
