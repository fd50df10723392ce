"""Whole-scene 2D-feature precompute route (eval/precompute.py —
the reference's ScanNet2D3DWhole + get_2d3dfeature offline cache consumed
by architectures_new.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.eval.precompute import attach_precomputed_features
from mvkpconv_tpu.models import MVKPConv, UNetResNet34
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.init import jit_init

CFG = KPConfig(
    fusion="early",
    in_features_dim=66,
    architecture=("simple", "resnetb_strided", "resnetb",
                  "nearest_upsample", "unary"),
    num_points=(512, 128),
    conv_neighbors=(10, 10),
    pool_neighbors=(10,),
    first_features_dim=16,
    num_views=2,
    image_height=24,
    image_width=32,
    batch_num=2,
    pixel_window=5,
)


@pytest.fixture(scope="module")
def cached_scenes():
    scenes = []
    for i in range(2):
        s = synthetic.make_scene(seed=i, num_points=6000)
        s.update(synthetic.render_views(s, 4, CFG.image_height,
                                        CFG.image_width, seed=i))
        scenes.append(s)
    unet = UNetResNet34(CFG.num_classes)
    img0 = jnp.zeros((1, CFG.image_height, CFG.image_width, 3))
    unet_vars = jit_init(unet, img0)
    return attach_precomputed_features(
        scenes, CFG, unet_vars, drop_views=True
    )


def test_precompute_shapes_and_coverage(cached_scenes):
    for s in cached_scenes:
        assert s["feature_2d3d"].shape == (len(s["points"]), CFG.feature_2d_dim)
        assert "rgb" not in s and "depth" not in s
        # points visible to some camera carry non-degenerate features
        assert np.isfinite(s["feature_2d3d"]).all()
        assert np.abs(s["feature_2d3d"]).max() > 0


def test_precomputed_fusion_forward_and_batch(cached_scenes):
    ds = SphereDataset(cached_scenes, CFG, training=False, subsample=False)
    batch = ds.sample_batch(CFG.batch_num)
    assert batch["feature_2d3d"].shape == (
        CFG.batch_num, CFG.num_points[0], CFG.feature_2d_dim
    )
    dev = {k: jnp.asarray(v) for k, v in device_batch(batch).items()}
    assert "images" not in dev

    model = MVKPConv(CFG)
    spec = CFG.pyramid_spec()
    pyr = jax.jit(lambda p, m: build_pyramid(p, m, spec))(
        dev["points"], dev["mask"]
    )
    variables = jit_init(model, dev, pyr)
    # the 2D net must not have been instantiated on this route
    assert "net_2d" not in variables["params"]
    logits = model.apply(variables, dev, pyr, train=False)
    assert logits.shape == (CFG.batch_num, CFG.num_points[0], CFG.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
