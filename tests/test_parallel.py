"""Data-parallel sharding tests over the 8-device virtual CPU mesh."""

import os
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mvkpconv_tpu.data import SphereDataset, synthetic
from mvkpconv_tpu.data.spheres import device_batch
from mvkpconv_tpu.models import KPFCNN
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.parallel import batch_sharding, make_mesh, replicated, shard_batch
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.optim import make_optimizer
from mvkpconv_tpu.training.steps import create_train_state, make_apply_fn, make_train_step


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert mesh2.axis_names == ("data", "model")


@pytest.mark.slow
@pytest.mark.parametrize(
    "gather_transpose", ["scatter", "sorted", "banded", "banded_bf16"]
)
def test_sharded_train_step_matches_single_device(gather_transpose):
    # 'sorted' pins that the sort/searchsorted gather transpose is
    # GSPMD-partitionable (the flat b·Ns row-fold crosses the sharded
    # batch dim). 'banded'/'banded_bf16' pin the shard_map path: the
    # Pallas kernel cannot auto-partition, so make_train_step(mesh=...)
    # wraps it shard-local over the data axis (VERDICT r4 #1) — the test
    # asserts the mode SURVIVES (no silent scatter fallback) and matches
    # the single-device step bit-close.
    cfg = KPConfig(
        num_points=(256, 64),
        conv_neighbors=(10, 10),
        pool_neighbors=(10,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.0,
        first_subsampling_dl=0.1,
        in_features_dim=2,
        first_features_dim=16,
        num_classes=20,
        batch_num=8,
        gather_transpose=gather_transpose,
    )
    scenes = [synthetic.make_scene(seed=0, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    batch = device_batch(ds.sample_batch(8))

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr)
    tx = make_optimizer(cfg)
    apply_fn = make_apply_fn(model, cfg, "kpfcnn")

    # single-device run
    step1 = make_train_step(apply_fn, tx, cfg, donate=False)
    state1 = create_train_state(variables, tx)
    state1, stats1 = step1(state1, batch)

    # sharded run over the 8-device mesh; banded modes get the mesh so the
    # shard_map path (not the scatter fallback) is what runs
    mesh = make_mesh()
    state2 = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    sbatch = shard_batch(batch, mesh)
    assert sbatch["points"].sharding.spec == batch_sharding(mesh).spec
    step2 = make_train_step(
        apply_fn, tx, cfg, donate=False,
        mesh=mesh if gather_transpose.startswith("banded") else None,
    )
    import warnings as _w

    with _w.catch_warnings():
        # the banded fallback emits a warning — escalate it so a silent
        # mode regression fails the test
        _w.filterwarnings(
            "error", message=".*falling back to the scatter transpose.*"
        )
        state2, stats2 = step2(state2, sbatch)

    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats2["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state1.params)),
        jax.tree_util.tree_leaves(jax.device_get(state2.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_shard_batch_places_all_leaves():
    mesh = make_mesh()
    batch = {"a": np.zeros((8, 4), np.float32), "b": np.zeros((8,), np.int32)}
    out = shard_batch(batch, mesh)
    for leaf in out.values():
        assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_2d_mesh_data_model_matches_single_device():
    """(data=4, model=2) mesh: batch over data, channel dims over model.

    The tensor-parallel layout no model in this family needs for capacity,
    kept exercised so multi-host growth is a config change (ROADMAP #5).
    """
    from mvkpconv_tpu.parallel import model_sharding

    cfg = KPConfig(
        num_points=(256, 64),
        conv_neighbors=(10, 10),
        pool_neighbors=(10,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.0,
        first_subsampling_dl=0.1,
        in_features_dim=2,
        first_features_dim=64,  # wide enough that channel dims shard 2-way
        num_classes=20,
        batch_num=4,
    )
    scenes = [synthetic.make_scene(seed=0, num_points=8000)]
    ds = SphereDataset(scenes, cfg, training=False, seed=0)
    batch = device_batch(ds.sample_batch(4))

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]), cfg.pyramid_spec()
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr)
    tx = make_optimizer(cfg)
    apply_fn = make_apply_fn(model, cfg, "kpfcnn")

    step1 = make_train_step(apply_fn, tx, cfg, donate=False)
    state1, stats1 = step1(create_train_state(variables, tx), batch)

    mesh = make_mesh((4, 2), ("data", "model"))
    state2 = create_train_state(variables, tx)
    psh = model_sharding(mesh, state2.params, min_dim=16)
    # at least one weight must actually shard over the model axis
    from jax.sharding import PartitionSpec as P
    assert any(
        s.spec == P(*([None] * (len(s.spec) - 1) + ["model"])) and len(s.spec) > 0
        for s in jax.tree_util.tree_leaves(
            psh, is_leaf=lambda x: hasattr(x, "spec")
        )
    )
    state2 = state2._replace(
        params=jax.tree.map(jax.device_put, state2.params, psh),
        batch_stats=jax.device_put(state2.batch_stats, replicated(mesh)),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(
                x, replicated(mesh)
            ),
            state2.opt_state,
        ),
        step=jax.device_put(state2.step, replicated(mesh)),
    )
    sbatch = shard_batch(batch, mesh)
    step2 = make_train_step(apply_fn, tx, cfg, donate=False)
    state2, stats2 = step2(state2, sbatch)

    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats2["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state1.params)),
        jax.tree_util.tree_leaves(jax.device_get(state2.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_shard_scenes_and_local_batch():
    from mvkpconv_tpu.parallel import local_batch_size, shard_scenes

    scenes = list(range(5))
    s0 = shard_scenes(scenes, 0, 2)
    s1 = shard_scenes(scenes, 1, 2)
    assert sorted(s0 + s1) == scenes and not (set(s0) & set(s1))
    assert abs(len(s0) - len(s1)) <= 1
    with pytest.raises(ValueError):
        shard_scenes([1], 1, 2)  # host 1 would own nothing
    with pytest.raises(ValueError):
        shard_scenes(scenes, 2, 2)
    assert local_batch_size(8, 2) == 4
    with pytest.raises(ValueError):
        local_batch_size(5, 2)


@pytest.mark.slow
def test_two_simulated_host_shards_train_on_mesh():
    """Simulate the N-host data path in one process: two scene-sharded
    SphereDatasets each sample half the global batch; the concatenated
    batch trains on the 8-device mesh. (Real multi-host replaces the
    concatenation with jax.make_array_from_process_local_data — see
    parallel/multihost.py; the jitted step is identical.)"""
    cfg = KPConfig(
        num_points=(256, 64),
        conv_neighbors=(10, 10),
        pool_neighbors=(10,),
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        in_radius=1.0,
        first_subsampling_dl=0.1,
        in_features_dim=2,
        first_features_dim=16,
        num_classes=20,
        batch_num=8,
    )
    from mvkpconv_tpu.parallel import local_batch_size, shard_scenes

    scenes = [synthetic.make_scene(seed=s, num_points=8000) for s in range(3)]
    lb = local_batch_size(cfg.batch_num, 2)
    hosts = [
        SphereDataset(shard_scenes(scenes, pi, 2), cfg, training=True,
                      seed=1000 * pi)
        for pi in range(2)
    ]
    # each "host" samples its local slice; potentials are host-local state
    locals_ = [device_batch(h.sample_batch(lb)) for h in hosts]
    batch = {k: np.concatenate([lb_[k] for lb_ in locals_]) for k in locals_[0]}
    assert batch["points"].shape[0] == cfg.batch_num

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]),
        cfg.pyramid_spec(),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["features"]), pyr
    )
    tx = make_optimizer(cfg)
    mesh = make_mesh()
    step = make_train_step(make_apply_fn(model, cfg, "kpfcnn"), tx, cfg,
                           donate=False)
    state = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    sbatch = shard_batch(batch, mesh)
    state, stats = step(state, sbatch)
    assert np.isfinite(float(stats["loss"]))
    assert int(np.asarray(state.step)) == 1


def test_global_batch_two_processes():
    """Run ``global_batch_from_local`` — including the Trainer's
    ``process_count() > 1`` branch — under a REAL ``jax.distributed`` setup:
    two coordinator-connected CPU processes with 2 virtual devices each
    (gloo collectives). Closes the round-3 gap that
    ``jax.make_array_from_process_local_data`` had only ever executed with
    process_count == 1. See tests/multihost_worker.py for what each
    process asserts (helpers, assembled-batch content via a jitted
    cross-process reduction, 4 Trainer.fit steps)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:  # free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "multihost_worker.py"
    repo = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ, PYTHONPATH=repo)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out
