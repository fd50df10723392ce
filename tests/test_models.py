"""Model construction + forward tests (shape/mask/jit), mirroring the
reference's inline smoke tests (unet_resnet34.py:141-152, pn2ssg.py:141-159,
mvpnet_3d.py:137-229) but as a real suite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.models import KPFCNN, MVPNet3D, PN2SSG, UNetResNet34
from mvkpconv_tpu.models.kpfcnn import plan_architecture
from mvkpconv_tpu.ops import masked_points
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig

TINY_ARCH = (
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
)


def tiny_config(**kw):
    base = dict(
        architecture=TINY_ARCH,
        num_classes=5,
        in_features_dim=4,
        first_features_dim=16,
        first_subsampling_dl=0.1,
        num_points=(256, 64, 16),
        conv_neighbors=(16, 16, 16),
        pool_neighbors=(16, 16),
    )
    base.update(kw)
    return KPConfig(**base)


def test_plan_architecture_dims():
    cfg = tiny_config()
    enc, dec, skips = plan_architecture(cfg)
    assert len(enc) == 6 and len(dec) == 4
    # first block: in = in_features_dim, out = first_features_dim
    assert enc[0][1] == 4 and enc[0][2] == 16
    # 'simple' halves: next in_dim is 8
    assert enc[1][1] == 8
    # skip dims recorded at each strided block + bottleneck entry
    assert skips == [16, 32, 64]
    # decoder concat flags on the blocks after upsamples
    assert [d[5] for d in dec] == [False, True, False, True]


def _pyramid_batch(rng, cfg, b=2):
    n0 = cfg.num_points[0]
    pts = rng.rand(b, n0, 3).astype(np.float32) * 1.5
    mask = np.ones((b, n0), bool)
    mask[:, -30:] = False
    pts = np.asarray(masked_points(jnp.asarray(pts), jnp.asarray(mask)))
    pyr = build_pyramid(jnp.asarray(pts), jnp.asarray(mask), cfg.pyramid_spec())
    feats = rng.randn(b, n0, cfg.in_features_dim).astype(np.float32)
    return pyr, jnp.asarray(feats)


def test_kpfcnn_forward_shapes(rng):
    cfg = tiny_config()
    pyr, feats = _pyramid_batch(rng, cfg)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, pyr)
    logits = model.apply(variables, feats, pyr)
    assert logits.shape == (2, 256, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_kpfcnn_train_updates_batch_stats(rng):
    cfg = tiny_config()
    pyr, feats = _pyramid_batch(rng, cfg)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, pyr)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    logits, updates = model.apply(
        variables, feats, pyr, train=True, mutable=["batch_stats"]
    )
    after = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert logits.shape == (2, 256, 5)
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_kpfcnn_grad_flows(rng):
    cfg = tiny_config()
    pyr, feats = _pyramid_batch(rng, cfg)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, pyr)

    def loss_fn(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                          feats, pyr)
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0 and all(np.isfinite(n) for n in norms)


def test_unet_resnet34_shapes(rng):
    # 56x72 exercises the same pad-to-16/crop logic as the production
    # 120x160 at ~5x less CPU time (full-res covered by the slow tier's
    # training e2e tests)
    model = UNetResNet34(num_classes=7)
    img = jnp.asarray(rng.rand(2, 56, 72, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["seg_logit"].shape == (2, 56, 72, 7)
    assert out["feature"].shape == (2, 56, 72, 64)


@pytest.mark.slow
def test_pn2ssg_shapes(rng):
    model = PN2SSG(num_classes=6, num_centroids=(64, 16, 8, 4))
    pts = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts, feats)
    logits = model.apply(variables, pts, feats)
    assert logits.shape == (2, 256, 6)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_mvpnet3d_forward(rng):
    b, v, h, w, n, k = 1, 2, 32, 48, 128, 3
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "images": jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32)),
        "image_xyz": jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32)),
        "knn_indices": jnp.asarray(
            rng.randint(0, v * h * w, size=(b, n, k)).astype(np.int32)
        ),
    }
    model = MVPNet3D(num_classes=6)
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits = model.apply(variables, batch)
    assert logits.shape == (b, n, 6)


@pytest.mark.slow
def test_mvpnet_frozen_2d_blocks_grads(rng):
    b, v, h, w, n, k = 1, 1, 16, 16, 64, 3
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "images": jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32)),
        "image_xyz": jnp.asarray(rng.rand(b, v, h, w, 3).astype(np.float32)),
        "knn_indices": jnp.asarray(
            rng.randint(0, v * h * w, size=(b, n, k)).astype(np.int32)
        ),
    }
    model = MVPNet3D(num_classes=4, freeze_2d=True)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, batch
        )
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    g2d = jax.tree_util.tree_leaves(g["net_2d"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in g2d)
    g3d = jax.tree_util.tree_leaves(g["net_3d"])
    assert max(float(jnp.abs(x).max()) for x in g3d) > 0


def test_hoisted_influence_matches_inline():
    """kpconv_apply with a precomputed rigid_influence cache must match the
    self-contained path exactly (same formula, computed once — the hoisting
    that lets every rigid conv block at a pyramid level share the weights)."""
    import numpy as np

    from mvkpconv_tpu.models.blocks import kpconv_apply, rigid_influence

    rng = np.random.RandomState(3)
    b, n, k, m, cin, cout = 2, 64, 8, 15, 6, 5
    q = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, n + 1, (b, n, k)), jnp.int32)  # incl shadow
    x = jnp.asarray(rng.randn(b, n, cin), jnp.float32)
    kp = jnp.asarray(rng.randn(m, 3), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(m, cin, cout), jnp.float32) * 0.1
    ext = 0.5
    for influence in ("linear", "gaussian"):
        for agg in ("sum", "closest"):
            ref = kpconv_apply(q, q, idx, x, kp, w, ext, influence, agg)
            allw = rigid_influence(q, q, idx, kp, ext, influence, agg)
            got = kpconv_apply(
                q, q, idx, x, kp, w, ext, influence, agg,
                precomputed_influence=allw,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
            )


def test_gform_tail_matches_einsum():
    """The g-form tails (weights folded into support features before the
    gather — the trunk-glue structural variant) must match the einsum tail
    up to f32 reassociation, with shadow indices and modulations."""
    import numpy as np

    from mvkpconv_tpu.models.blocks import kpconv_apply, rigid_influence

    rng = np.random.RandomState(7)
    b, n, k, m, cin, cout = 2, 64, 8, 15, 6, 5
    q = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, n + 1, (b, n, k)), jnp.int32)  # incl shadow
    x = jnp.asarray(rng.randn(b, n, cin), jnp.float32)
    kp = jnp.asarray(rng.randn(m, 3), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(m, cin, cout), jnp.float32) * 0.1
    mods = jnp.asarray(rng.rand(b, n, m), jnp.float32)
    ext = 0.5
    allw = rigid_influence(q, q, idx, kp, ext, "linear", "sum")
    for kp_mods in (None, mods):
        ref = kpconv_apply(
            q, q, idx, x, kp, w, ext, kp_modulations=kp_mods,
            precomputed_influence=allw,
        )
        for tail in ("vpu", "gform_dot", "gform_vpu"):
            got = kpconv_apply(
                q, q, idx, x, kp, w, ext, kp_modulations=kp_mods,
                precomputed_influence=allw, tail=tail,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
                err_msg=f"tail={tail} mods={kp_mods is not None}",
            )
        # 'vpu' on the GENERAL path (no precomputed influence — the branch
        # deformable and non-cached rigid blocks take)
        ref_gen = kpconv_apply(q, q, idx, x, kp, w, ext, kp_modulations=kp_mods)
        got_gen = kpconv_apply(
            q, q, idx, x, kp, w, ext, kp_modulations=kp_mods, tail="vpu"
        )
        np.testing.assert_allclose(
            np.asarray(got_gen), np.asarray(ref_gen), rtol=1e-5, atol=1e-5,
            err_msg=f"general-path vpu mods={kp_mods is not None}",
        )
    with pytest.raises(ValueError, match="unknown kpconv tail"):
        kpconv_apply(
            q, q, idx, x, kp, w, ext, precomputed_influence=allw, tail="bogus"
        )


def test_kpfcnn_gform_tail_end_to_end(rng):
    """cfg.kpconv_tail='gform_dot' must give the same KPFCNN logits and
    finite nonzero grads as the default einsum tail (threads the option
    through SimpleBlock/ResnetBottleneckBlock + the influence cache)."""
    pyr, feats = _pyramid_batch(rng, tiny_config())
    variables = None
    outs = {}
    for tail in ("einsum", "gform_dot"):
        cfg = tiny_config(kpconv_tail=tail)
        model = KPFCNN(cfg)
        if variables is None:  # same params for both (same module tree)
            variables = model.init(jax.random.PRNGKey(0), feats, pyr)
        outs[tail] = np.asarray(model.apply(variables, feats, pyr))
    np.testing.assert_allclose(
        outs["gform_dot"], outs["einsum"], rtol=2e-4, atol=2e-4
    )

    def loss_fn(params):
        out = KPFCNN(tiny_config(kpconv_tail="gform_vpu")).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, pyr,
        )
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0 and all(np.isfinite(n) for n in norms)


def test_kpconv_tail_auto(rng):
    """kpconv_tail='auto' (the production default) resolves to 'einsum' at
    eval — logits must be BITWISE identical to kpconv_tail='einsum' — and
    to 'vpu' under train=True, where the train-mode forward must match the
    einsum tail to reassociation tolerance with finite nonzero grads."""
    from mvkpconv_tpu.models.blocks import _resolve_tail

    assert _resolve_tail("auto", train=False) == "einsum"
    assert _resolve_tail("auto", train=True) == "vpu"
    assert _resolve_tail("vpu", train=False) == "vpu"

    pyr, feats = _pyramid_batch(rng, tiny_config())
    model_auto = KPFCNN(tiny_config(kpconv_tail="auto"))
    model_einsum = KPFCNN(tiny_config(kpconv_tail="einsum"))
    variables = model_auto.init(jax.random.PRNGKey(0), feats, pyr)
    out_auto = np.asarray(model_auto.apply(variables, feats, pyr))
    out_einsum = np.asarray(model_einsum.apply(variables, feats, pyr))
    np.testing.assert_array_equal(out_auto, out_einsum)

    def loss_fn(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, pyr, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    l_auto = float(loss_fn(variables["params"], model_auto))
    l_ein = float(loss_fn(variables["params"], model_einsum))
    np.testing.assert_allclose(l_auto, l_ein, rtol=1e-4)
    g = jax.grad(loss_fn)(variables["params"], model_auto)
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0 and all(np.isfinite(n) for n in norms)


def test_influence_cache_budget_fallback(rng):
    """The influence cache's analytic HBM accounting and its automatic
    skip fallback: a zero budget must disable the cache (empty dict), and
    the model's logits must be identical either way (blocks recompute the
    same influence in place when their cache key is missing)."""
    from mvkpconv_tpu.models.kpfcnn import (
        build_influence_cache,
        influence_cache_bytes,
        plan_architecture,
    )

    cfg_on = tiny_config()
    cfg_off = tiny_config(influence_cache_budget_mb=0.0)
    pyr, feats = _pyramid_batch(rng, cfg_on)

    plans = plan_architecture(cfg_on)[:2]
    needed = {}
    for plan in plans:
        for name, _i, _o, r, layer, _c in plan:
            if "simple" in name or "resnetb" in name:
                needed[("pool" if "strided" in name else "conv", layer)] = r
    nbytes = influence_cache_bytes(cfg_on, needed, pyr)
    # analytic: conv levels 0..2 (B=2, N=256/64/16, K=16) + pools 0..1
    # (queries are the next level's points), M=15, f32
    expect = 0
    for (kind, layer) in needed:
        q = pyr.points[layer + 1] if kind == "pool" else pyr.points[layer]
        expect += 2 * q.shape[1] * 16 * 15 * 4
    assert nbytes == expect > 0

    cache = build_influence_cache(cfg_on, plans, pyr)
    assert set(cache) == set(needed)
    assert build_influence_cache(cfg_off, plans, pyr) == {}

    model_on, model_off = KPFCNN(cfg_on), KPFCNN(cfg_off)
    variables = model_on.init(jax.random.PRNGKey(0), feats, pyr)
    out_on = model_on.apply(variables, feats, pyr)
    out_off = model_off.apply(variables, feats, pyr)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-5, atol=1e-5
    )


def test_influence_cache_policy_parity(rng):
    """The three influence-sharing policies ('prebuilt' hoisted cache —
    the measured production winner, 'lazy' first-block deposit, 'none'
    recompute-in-place) are pure scheduling choices: the model's logits
    must be bit-comparable across all of them, with grads finite under
    'lazy' (the deposit rides the depositing block's own forward)."""
    from mvkpconv_tpu.models.kpfcnn import make_influence_cache, plan_architecture

    cfgs = {p: tiny_config(influence_cache=p)
            for p in ("prebuilt", "lazy", "none")}
    pyr, feats = _pyramid_batch(rng, cfgs["prebuilt"])
    plans = plan_architecture(cfgs["prebuilt"])[:2]

    # policy → cache shape contract
    assert isinstance(
        make_influence_cache(cfgs["prebuilt"], plans, pyr), dict
    ) and make_influence_cache(cfgs["prebuilt"], plans, pyr)
    assert make_influence_cache(cfgs["lazy"], plans, pyr) == {}
    assert make_influence_cache(cfgs["none"], plans, pyr) is None
    # remat='blocks' forces prebuilt (lazy deposits would leak tracers
    # across the nn.remat boundary)
    assert make_influence_cache(
        tiny_config(influence_cache="lazy", remat="blocks"), plans, pyr
    )

    models = {p: KPFCNN(c) for p, c in cfgs.items()}
    variables = models["prebuilt"].init(jax.random.PRNGKey(0), feats, pyr)
    outs = {p: np.asarray(m.apply(variables, feats, pyr))
            for p, m in models.items()}
    np.testing.assert_allclose(outs["lazy"], outs["prebuilt"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["none"], outs["prebuilt"], rtol=1e-5, atol=1e-5)

    def loss_fn(params):
        out = models["lazy"].apply(
            {**variables, "params": params}, feats, pyr,
            train=True, mutable=["batch_stats", "intermediates"],
        )[0]
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0 and all(np.isfinite(n) for n in norms)
