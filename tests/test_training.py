"""End-to-end training harness tests on synthetic scenes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.models import KPFCNN
from mvkpconv_tpu.training.checkpoint import Checkpointer
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import (
    create_train_state,
    make_apply_fn,
    make_eval_step,
    make_train_step,
)
from mvkpconv_tpu.training.trainer import Trainer


def small_cfg(**kw):
    base = dict(
        num_points=(512, 128),
        conv_neighbors=(12, 12),
        pool_neighbors=(12,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.0,
        first_subsampling_dl=0.08,
        in_features_dim=2,
        first_features_dim=16,
        num_classes=20,
        batch_num=2,
        epoch_steps=4,
        learning_rate=1e-2,
    )
    base.update(kw)
    return KPConfig(**base)


@pytest.fixture(scope="module")
def scenes():
    return [synthetic.make_scene(seed=s, num_points=15000) for s in range(2)]


def _setup(cfg, scenes, seed=0):
    ds = SphereDataset(scenes, cfg, training=True, seed=seed)
    model = KPFCNN(cfg)
    apply_fn = make_apply_fn(model, cfg, "kpfcnn")
    batch = device_batch(ds.sample_batch())
    tx = make_optimizer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["features"]),
        __import__("mvkpconv_tpu.ops.pyramid", fromlist=["build_pyramid"]).build_pyramid(
            jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
        ),
    )
    state = create_train_state(variables, tx)
    step = make_train_step(apply_fn, tx, cfg)
    return ds, state, step, apply_fn, tx


def test_train_step_reduces_loss(scenes):
    cfg = small_cfg()
    ds, state, step, _, _ = _setup(cfg, scenes)
    losses = []
    batch = device_batch(ds.sample_batch())  # overfit one batch
    for _ in range(12):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 12


def test_eval_step_probabilities(scenes):
    cfg = small_cfg()
    ds, state, step, apply_fn, _ = _setup(cfg, scenes)
    ev = make_eval_step(apply_fn, cfg)
    probs = ev(state, device_batch(ds.sample_batch()))
    p = np.asarray(probs)
    assert p.shape == (2, 512, 20)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)


def test_checkpointer_roundtrip_and_gc(tmp_path, scenes):
    cfg = small_cfg()
    ds, state, step, _, _ = _setup(cfg, scenes)
    ck = Checkpointer(tmp_path, max_to_keep=2)
    state, _ = step(state, device_batch(ds.sample_batch()))
    for s in range(4):
        ck.save(jax.device_get(state), s, is_best=(s == 1))
    assert len(list(tmp_path.glob("ckpt_*.msgpack"))) == 2  # GC keeps 2
    restored = ck.restore(jax.device_get(state))
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(jax.device_get(state).step)
    )
    leaves_a = jax.tree_util.tree_leaves(restored.params)
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(state).params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)
    assert ck.restore_best(jax.device_get(state)) is not None


def test_trainer_loop_and_resume(tmp_path, scenes):
    cfg = small_cfg(max_epoch=1, epoch_steps=3)
    ds, state, step, apply_fn, tx = _setup(cfg, scenes)
    batches = (device_batch(b) for b in ds.batches())
    trainer = Trainer(step, state, tmp_path / "run", cfg, log_period=1)
    final = trainer.fit(batches, max_steps=3)
    assert int(np.asarray(final.step)) == 3
    assert (tmp_path / "run" / "training.txt").exists()
    assert (tmp_path / "run" / "parameters.txt").exists()
    lines = (tmp_path / "run" / "training.txt").read_text().splitlines()
    assert len(lines) == 4  # header + 3 steps
    # resume: fresh trainer picks up the checkpoint
    _, state2, step2, _, _ = _setup(cfg, scenes)
    trainer2 = Trainer(step2, state2, tmp_path / "run", cfg, log_period=1)
    trainer2.maybe_resume()
    assert int(np.asarray(trainer2.state.step)) == 3


def test_frozen_params_not_updated(scenes):
    cfg = small_cfg()
    ds, _, _, apply_fn, _ = _setup(cfg, scenes)
    # freeze the head: its params must stay bit-identical through a step
    from mvkpconv_tpu.models import KPFCNN
    from mvkpconv_tpu.ops.pyramid import build_pyramid

    model = KPFCNN(cfg)
    batch = device_batch(ds.sample_batch())
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr)
    tx = make_optimizer(cfg, frozen_prefixes=("head",))
    state = create_train_state(variables, tx)
    step = make_train_step(make_apply_fn(model, cfg, "kpfcnn"), tx, cfg)
    before = jax.device_get(state.params["head"])
    before_enc = jax.device_get(state.params["encoder"])
    state, _ = step(state, batch)
    after = jax.device_get(state.params["head"])
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    # non-frozen changed
    assert not all(
        np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state.params["encoder"])),
            jax.tree_util.tree_leaves(before_enc),
        )
    )


def test_label_smoothing_and_class_balance(rng):
    """smooth_cross_entropy semantics + segloss_balance='class' reweighting."""
    from mvkpconv_tpu.training.losses import segmentation_cross_entropy

    n, c = 64, 5
    logits = jnp.asarray(rng.randn(n, c), jnp.float32)
    labels = jnp.asarray(rng.randint(0, c, n), jnp.int32)

    # numpy oracle of the reference's smooth CE (functional.py:100-119)
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    eps = 0.2
    onehot = np.eye(c)[np.asarray(labels)]
    smooth = onehot * (1 - eps) + eps / c
    want = float((-smooth * lp).sum(1).mean())
    got = float(segmentation_cross_entropy(logits, labels, label_smoothing=eps))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # class balance: per-class mean contributions become equal for a batch
    # with skewed counts — loss equals the mean over per-class mean NLLs
    skew = jnp.asarray([0] * 60 + [1, 2, 3, 4], jnp.int32)
    nll = -np.take_along_axis(lp, np.asarray(skew)[:, None], 1)[:, 0]
    per_class = [nll[np.asarray(skew) == k].mean() for k in range(c)]
    want_b = float(np.mean(per_class))
    got_b = float(segmentation_cross_entropy(logits, skew, balance="class"))
    np.testing.assert_allclose(got_b, want_b, rtol=1e-5)

    # ignore labels excluded either way
    lab2 = labels.at[:10].set(-1)
    base = float(segmentation_cross_entropy(logits, lab2))
    assert np.isfinite(base)


def test_trainer_profile_capture(tmp_path):
    """profile_steps captures a profiler trace dir (best-effort tracing —
    the reference only had wall-clock meters, SURVEY §5)."""
    import optax

    from mvkpconv_tpu.training.trainer import Trainer
    from mvkpconv_tpu.training.config import KPConfig

    cfg = KPConfig(epoch_steps=100)
    params = {"w": jnp.zeros((4,))}
    tx = optax.sgd(0.1)
    state = create_train_state({"params": params}, tx)

    @jax.jit
    def step(st, batch):
        def loss_fn(p):
            return jnp.sum((p["w"] - batch["x"]) ** 2)
        g = jax.grad(loss_fn)(st.params)
        upd, opt = tx.update(g, st.opt_state, st.params)
        import optax as _o
        return st._replace(step=st.step + 1,
                           params=_o.apply_updates(st.params, upd),
                           opt_state=opt), {"loss": loss_fn(st.params)}

    tr = Trainer(step, state, tmp_path / "run", cfg, profile_steps=2,
                 log_period=1)
    batches = ({"x": jnp.ones((4,))} for _ in range(8))
    tr.fit(batches, max_steps=8, prefetch_depth=0)
    prof = tmp_path / "run" / "profile"
    # best-effort: either a trace was written or capture was cleanly skipped
    if prof.exists():
        assert any(prof.rglob("*"))
    assert (tmp_path / "run" / "scalars.jsonl").exists()


def test_remat_blocks_matches_none(scenes):
    """cfg.remat='blocks' must be a pure memory/recompute tradeoff: identical
    loss, gradients (via the updated params), and parameter tree to
    remat='none' on the same initial state and batch. Also pins the
    checkpoint-compatibility claim in block_decider: nn.remat wrappers must
    not change parameter names."""
    cfg_none = small_cfg()
    cfg_remat = small_cfg(remat="blocks")
    assert cfg_remat.remat == "blocks"

    ds = SphereDataset(scenes, cfg_none, training=True, seed=3)
    batch = device_batch(ds.sample_batch())

    results = {}
    trees = {}
    for cfg in (cfg_none, cfg_remat):
        model = KPFCNN(cfg)
        apply_fn = make_apply_fn(model, cfg, "kpfcnn")
        tx = make_optimizer(cfg)
        from mvkpconv_tpu.ops.pyramid import build_pyramid

        pyr = build_pyramid(
            jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]),
            cfg.pyramid_spec(),
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr
        )
        state = create_train_state(variables, tx)
        step = make_train_step(apply_fn, tx, cfg, donate=False)
        new_state, stats = step(state, batch)
        results[cfg.remat] = (float(stats["loss"]), new_state.params)
        trees[cfg.remat] = jax.tree_util.tree_structure(variables["params"])

    # identical parameter tree (remat-independent checkpoints)
    assert trees["none"] == trees["blocks"]
    loss_n, params_n = results["none"]
    loss_r, params_r = results["blocks"]
    assert loss_n == pytest.approx(loss_r, rel=1e-6)
    flat_n, _ = jax.tree_util.tree_flatten(params_n)
    flat_r, _ = jax.tree_util.tree_flatten(params_r)
    for a, b in zip(flat_n, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
