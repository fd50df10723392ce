"""Serving export (eval/export.py): the artifact must reproduce the jitted
live step's probabilities (it serializes that exact program) and be runnable
standalone (deserialize → call, no model code). The reference has no analog
(its deployment unit is the source tree + torch checkpoint,
KPConv-PyTorch/test_models.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.eval.export import (
    ServingModel,
    batch_spec_for,
    export_inference,
    infer_kind,
    save_exported,
)
from mvkpconv_tpu.models import KPFCNN, MVKPConv
from mvkpconv_tpu.ops import masked_points
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.steps import make_apply_fn

TINY_ARCH = (
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "nearest_upsample",
    "unary",
)


def _cfg(fusion="none"):
    return KPConfig(
        architecture=TINY_ARCH,
        num_classes=5,
        in_features_dim=66 if fusion != "none" else 2,
        feature_2d_dim=64 if fusion != "none" else 0,
        first_features_dim=16,
        first_subsampling_dl=0.1,
        num_points=(128, 32),
        conv_neighbors=(12, 12),
        pool_neighbors=(12,),
        fusion=fusion,
        num_views=2,
        image_height=24,
        image_width=32,
        batch_num=1,
    )


def _batch(rng, cfg, kind):
    spec = batch_spec_for(cfg, kind)
    batch = {}
    for k, s in spec.items():
        if k == "mask":
            m = np.ones(s.shape, bool)
            m[:, -10:] = False
            batch[k] = jnp.asarray(m)
        elif k == "poses":
            batch[k] = jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), s.shape[:2] + (1, 1))
            )
        elif k == "intrinsics":
            K = np.zeros(s.shape, np.float32)
            K[..., 0, 0] = K[..., 1, 1] = 20.0
            K[..., 0, 2], K[..., 1, 2] = cfg.image_width / 2, cfg.image_height / 2
            K[..., 2, 2] = 1.0
            batch[k] = jnp.asarray(K)
        else:
            batch[k] = jnp.asarray(rng.rand(*s.shape).astype(np.float32))
    batch["points"] = masked_points(batch["points"], batch["mask"])
    return batch


@pytest.mark.parametrize("fusion", ["none", "early"])
def test_export_roundtrip_matches_live_model(rng, fusion, tmp_path):
    cfg = _cfg(fusion)
    kind = infer_kind(cfg)
    assert kind == ("kpfcnn" if fusion == "none" else "mvkpconv")
    model = KPFCNN(cfg) if kind == "kpfcnn" else MVKPConv(cfg)
    batch = _batch(rng, cfg, kind)
    pyr = build_pyramid(batch["points"], batch["mask"], cfg.pyramid_spec())
    if kind == "kpfcnn":
        variables = model.init(jax.random.PRNGKey(0), batch["features"], pyr)
    else:
        variables = model.init(jax.random.PRNGKey(0), batch, pyr)

    data = export_inference(model, cfg, kind, variables)
    path = save_exported(data, tmp_path / "model.stablehlo")
    served = ServingModel.load(path)

    got = np.asarray(served(batch))
    # Compare against the JITTED live step: the artifact serializes that
    # exact program, so agreement is bitwise-tight. (The eager apply path
    # fuses differently and drifts ~1e-3 in relative terms — fine, but not
    # what the artifact contract promises.)
    apply_fn = make_apply_fn(model, cfg, kind)
    want_logits, _ = jax.jit(
        lambda v, b: apply_fn(v, b, False, False)
    )(variables, batch)
    want = np.asarray(jax.nn.softmax(want_logits, axis=-1))
    assert got.shape == (1, cfg.num_points[0], cfg.num_classes)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # contract surface for the serving edge
    assert len(served.platforms) >= 1
    assert jax.tree_util.tree_structure(served.in_avals[0]) is not None


def test_export_rejects_unknown_kind():
    cfg = _cfg()
    with pytest.raises(ValueError, match="no default batch spec"):
        batch_spec_for(cfg, "pn2")


def test_export_mvpnet_roundtrip(rng, tmp_path):
    from mvkpconv_tpu.models import MVPNet3D

    cfg = _cfg("none").replace(num_points=(64, 16))
    batch = {}
    for k, s in batch_spec_for(cfg, "mvpnet").items():
        if k == "poses":
            batch[k] = jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), s.shape[:2] + (1, 1))
            )
        elif k == "intrinsics":
            K = np.zeros(s.shape, np.float32)
            K[..., 0, 0] = K[..., 1, 1] = 20.0
            K[..., 0, 2], K[..., 1, 2] = cfg.image_width / 2, cfg.image_height / 2
            K[..., 2, 2] = 1.0
            batch[k] = jnp.asarray(K)
        else:
            batch[k] = jnp.asarray(rng.rand(*s.shape).astype(np.float32))
    model = MVPNet3D(cfg.num_classes)
    variables = model.init(jax.random.PRNGKey(0), batch)
    data = export_inference(model, cfg, "mvpnet", variables)
    served = ServingModel.from_bytes(data)
    got = np.asarray(served(batch))
    apply_fn = make_apply_fn(model, cfg, "mvpnet")
    want_logits, _ = jax.jit(
        lambda v, b: apply_fn(v, b, False, False)
    )(variables, batch)
    want = np.asarray(jax.nn.softmax(want_logits, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_whole_scene_export_reproduces_voting(tmp_path):
    """The whole-scene artifact (VERDICT r4 #9) must reproduce the
    VotingTester's full-cloud predictions on a synthetic scene within
    smoothing tolerance (the artifact mean-accumulates; the tester
    exponentially smooths a stochastic potential sweep —
    utils/tester.py:90-185)."""
    import optax

    from mvkpconv_tpu.data import SphereDataset, synthetic
    from mvkpconv_tpu.data.spheres import assemble_features, device_batch
    from mvkpconv_tpu.eval.export import (
        cover_centers,
        export_whole_scene,
        pad_centers,
    )
    from mvkpconv_tpu.eval.voting import VotingTester
    from mvkpconv_tpu.training.init import jit_init
    from mvkpconv_tpu.training.optim import make_optimizer
    from mvkpconv_tpu.training.steps import (
        create_train_state,
        make_apply_fn,
        make_eval_step,
        make_train_step,
    )

    cfg = _cfg("none").replace(
        num_points=(512, 128), batch_num=2, in_radius=1.2,
        first_subsampling_dl=0.12,
    )
    scene = synthetic.make_scene(seed=3, num_points=20000)
    ds = SphereDataset([scene], cfg, training=False, seed=0)
    model = KPFCNN(cfg)
    apply_fn = make_apply_fn(model, cfg, "kpfcnn")

    # brief training so predictions are confident (argmax agreement between
    # two averaging schemes is only meaningful off the uniform plateau)
    tds = SphereDataset([scene], cfg, training=True, seed=1)
    b0 = device_batch(tds.sample_batch())
    pyr0 = build_pyramid(jnp.asarray(b0["points"]), jnp.asarray(b0["mask"]),
                         cfg.pyramid_spec())
    variables = jit_init(model, jnp.asarray(b0["features"]), pyr0)
    tx = make_optimizer(cfg)
    state = create_train_state(variables, tx)
    step = make_train_step(apply_fn, tx, cfg, donate=False)
    for _ in range(30):
        state, _ = step(state, device_batch(tds.sample_batch()))
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    eval_step = make_eval_step(apply_fn, cfg)
    tester = VotingTester(
        ds, lambda b: eval_step(state, b), cfg.num_classes, num_votes=4.0
    )
    tester.run(max_batches=60, prefetch_depth=0)
    want = tester.probs[0].argmax(-1)

    pts = ds.scenes[0]["points"]
    nmax = 16384
    assert len(pts) <= nmax
    base_dim = cfg.in_features_dim - cfg.feature_2d_dim
    feats = assemble_features(
        pts, ds.scenes[0]["colors"], base_dim, cfg.use_point_color
    )
    centers = pad_centers(cover_centers(pts, cfg.in_radius), 192)

    def pad(a, fill=0.0):
        return np.pad(a, [(0, nmax - len(a))] + [(0, 0)] * (a.ndim - 1),
                      constant_values=fill)

    data = export_whole_scene(model, cfg, "kpfcnn", trained, nmax, 192)
    served = ServingModel.from_bytes(data)
    out = served({
        "points": jnp.asarray(pad(pts, 1e6)),
        "mask": jnp.asarray(np.arange(nmax) < len(pts)),
        "features": jnp.asarray(pad(feats)),
        "centers": jnp.asarray(centers),
    })
    votes = np.asarray(out["votes"])[: len(pts)]
    got = np.asarray(out["probs"])[: len(pts)].argmax(-1)

    # cover_centers guarantees every point sits in some core region
    assert (votes > 0).mean() > 0.99
    agree = (got == want)[votes > 0].mean()
    assert agree > 0.8, f"artifact/tester argmax agreement {agree:.2%}"


@pytest.mark.slow
def test_export_cli_selftest(rng, tmp_path):
    """tools/export_model end-to-end: config on disk → artifact → selftest."""
    from mvkpconv_tpu.tools import export_model

    cfg = _cfg("none")
    cfg.save(tmp_path / "parameters.txt")
    export_model.main([
        "--config", str(tmp_path / "parameters.txt"),
        "--artifact", str(tmp_path / "model.stablehlo"),
        "--selftest",
    ])
    assert (tmp_path / "model.stablehlo").stat().st_size > 1000
