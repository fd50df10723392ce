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
    import flax.serialization as ser
    import numpy as np

    ck = Checkpointer(Path(run_dir) / "checkpoints")
    path = (Path(run_dir) / "checkpoints" / "model_best.msgpack")
    if not path.exists():
        path = ck.latest_path()
    if path is None:
        raise FileNotFoundError(f"no 2D checkpoint under {run_dir}/checkpoints")
    raw = ser.msgpack_restore(Path(path).read_bytes())

    def restore_subtree(target, restored, name):
        # from_state_dict checks tree structure/keys against the live subtree
        out = ser.from_state_dict(jax.device_get(target), restored)

        def check(t, v):
            v = np.asarray(v)
            if v.shape != np.shape(t):
                raise ValueError(
                    f"2D checkpoint {name} leaf shape {v.shape} does not "
                    f"match the fusion model's net_2d shape {np.shape(t)}"
                )
            return v.astype(np.asarray(t).dtype)

        return jax.tree.map(check, jax.device_get(target), out)

    new_vars = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables["batch_stats"]),
    }
    new_vars["params"]["net_2d"] = restore_subtree(
        variables["params"]["net_2d"], raw["params"], "params"
    )
    new_vars["batch_stats"]["net_2d"] = restore_subtree(
        variables["batch_stats"]["net_2d"], raw["batch_stats"], "batch_stats"
    )
    for k, v in variables.items():
        if k not in new_vars:
            new_vars[k] = v
    return new_vars
