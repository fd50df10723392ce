"""Worker for tests/test_parallel.py::test_global_batch_two_processes.

Spawned twice (process_id 0 / 1) with a shared coordinator port. Runs
jax.distributed over the CPU backend (2 virtual devices per process → a
4-device global mesh), then:

  1. asserts the multihost helpers' process-slicing semantics,
  2. assembles a global batch with ``global_batch_from_local`` and checks
     its content by summing the globally-sharded array inside jit
     (exercises the cross-process collective path),
  3. drives a real ``Trainer.fit`` loop with a toy train step so
     trainer.py's ``process_count() > 1`` branch — the
     ``global_batch_from_local`` call — actually executes multi-process.

Prints "WORKER_OK <pid>" on success; any assertion failure exits nonzero.
"""

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp

    from mvkpconv_tpu.parallel import (
        global_batch_from_local,
        local_batch_size,
        make_mesh,
        shard_scenes,
    )

    # 1. process-slicing helpers under a real process_count of 2
    scenes = list(range(5))
    mine = shard_scenes(scenes)
    assert mine == scenes[pid::2], (pid, mine)
    assert local_batch_size(4) == 2

    # 2. global batch assembly + content check through a jitted reduction
    mesh = make_mesh()  # all 4 global devices on the data axis
    local = {
        "x": np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100.0 * pid,
        "labels": np.full((2,), pid, np.int32),
    }
    gb = global_batch_from_local(local, mesh)
    assert gb["x"].shape == (4, 3), gb["x"].shape
    assert gb["labels"].shape == (4,)
    total = float(jax.jit(lambda b: jnp.sum(b["x"]) + jnp.sum(b["labels"]))(gb))
    # both processes contribute: sum(arange(6)) * 2 + 100*6 + (0*2 + 1*2)
    assert total == 15.0 * 2 + 600.0 + 2.0, total

    # 3. the Trainer multi-host branch (trainer.py: global_batch_from_local)
    import optax

    from mvkpconv_tpu.training.steps import TrainState
    from mvkpconv_tpu.training.trainer import Trainer

    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros((3,))}
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={},
        opt_state=tx.init(params),
    )

    def step(st, batch):
        def loss_fn(p):
            return jnp.mean((batch["x"] - p["w"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(st.params)
        upd, opt = tx.update(g, st.opt_state, st.params)
        return (
            st._replace(
                step=st.step + 1,
                params=optax.apply_updates(st.params, upd),
                opt_state=opt,
            ),
            {"loss": loss},
        )

    from mvkpconv_tpu.training.config import KPConfig

    cfg = KPConfig(epoch_steps=4)
    out = tempfile.mkdtemp(prefix=f"mh_worker{pid}_")
    trainer = Trainer(
        jax.jit(step), state, out, cfg, mesh=mesh, log_period=1
    )
    # each process feeds its LOCAL slice; the trainer assembles the global
    batches = ({"x": local["x"] + i} for i in range(4))
    trainer.fit(batches, max_steps=4, prefetch_depth=0)
    assert int(np.asarray(trainer.state.step)) == 4
    w = np.asarray(trainer.state.params["w"])
    assert np.isfinite(w).all() and np.abs(w).sum() > 0

    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
