"""Parameter transfer between training runs.

Replaces the reference's 2D-checkpoint loading into the fusion/MVPNet models
(architectures_sphere.py:226-237 ``torch.load(config.path_2D)`` into the
frozen UNet; mvpnet_3d.py:82-87 net_2d_ckpt_path): restore a ``train_2d``
run's UNet parameters (and batch stats) into the ``net_2d`` subtree of a
fusion model's variables.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax

from mvkpconv_tpu.training.checkpoint import Checkpointer


def load_2d_checkpoint_into(variables: Dict[str, Any], run_dir) -> Dict[str, Any]:
    """Return ``variables`` with the ``net_2d`` subtree replaced by the
    parameters of the 2D UNet trained at ``run_dir`` (a train_2d output dir;
    prefers the best-metric snapshot, falls back to the latest)."""
    ck = Checkpointer(Path(run_dir) / "checkpoints")
    # build a host-side template with the same structure as the saved
    # TrainState: reuse the fusion variables' net_2d subtree
    template = {
        "step": 0,
        "params": jax.device_get(variables["params"]["net_2d"]),
        "batch_stats": jax.device_get(variables["batch_stats"]["net_2d"]),
        "opt_state": None,
    }
    from mvkpconv_tpu.training.steps import TrainState
    import flax.serialization as ser

    path = (Path(run_dir) / "checkpoints" / "model_best.msgpack")
    if not path.exists():
        path = ck.latest_path()
    if path is None:
        raise FileNotFoundError(f"no 2D checkpoint under {run_dir}/checkpoints")
    raw = ser.msgpack_restore(Path(path).read_bytes())
    # raw is a dict-of-dicts TrainState; its params/batch_stats are the UNet's
    params_2d = raw["params"]
    stats_2d = raw["batch_stats"]
    new_vars = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables["batch_stats"]),
    }
    new_vars["params"]["net_2d"] = jax.tree.map(
        lambda t, v: v.reshape(t.shape).astype(t.dtype),
        jax.device_get(variables["params"]["net_2d"]),
        params_2d,
    )
    new_vars["batch_stats"]["net_2d"] = jax.tree.map(
        lambda t, v: v.reshape(t.shape).astype(t.dtype),
        jax.device_get(variables["batch_stats"]["net_2d"]),
        stats_2d,
    )
    for k, v in variables.items():
        if k not in new_vars:
            new_vars[k] = v
    return new_vars
