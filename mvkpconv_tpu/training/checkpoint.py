"""Checkpointing with last-tag, max_to_keep GC and best-metric tracking.

Replaces both reference systems (SURVEY.md §5): the KPConv ``.tar``
checkpoints (utils/trainer.py:247-261) and mvpnet's Checkpointer/
CheckpointerV2 (common/utils/checkpoint.py:12-175 — ``last_checkpoint`` tag
file, ``max_to_keep`` GC, best-metric snapshot). Serialization is flax
msgpack; the config is saved alongside as ``parameters.txt`` so checkpoint
dirs are self-describing like the reference's (utils/config.py:281-431).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
from flax import serialization


class Checkpointer:
    def __init__(self, directory, max_to_keep: int = 5):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep

    def _path(self, step: int) -> Path:
        return self.dir / f"ckpt_{step:08d}.msgpack"

    def save(self, state: Any, step: int, is_best: bool = False) -> Path:
        state = jax.device_get(state)
        data = serialization.to_bytes(state)
        path = self._path(step)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(data)
        os.replace(tmp, path)
        (self.dir / "last_checkpoint").write_text(path.name)
        if is_best:
            (self.dir / "model_best.msgpack").write_bytes(data)
        self._gc()
        return path

    def _gc(self):
        ckpts = sorted(self.dir.glob("ckpt_*.msgpack"))
        for old in ckpts[: -self.max_to_keep]:
            old.unlink()

    def latest_path(self) -> Optional[Path]:
        tag = self.dir / "last_checkpoint"
        if tag.exists():
            p = self.dir / tag.read_text().strip()
            if p.exists():
                return p
        ckpts = sorted(self.dir.glob("ckpt_*.msgpack"))
        return ckpts[-1] if ckpts else None

    def restore(self, target: Any, path: Optional[Path] = None) -> Any:
        """Restore into a pytree of the same structure (``target`` provides
        structure + shapes, e.g. a freshly created TrainState)."""
        path = path or self.latest_path()
        if path is None:
            return None
        return serialization.from_bytes(target, Path(path).read_bytes())

    def restore_best(self, target: Any) -> Any:
        p = self.dir / "model_best.msgpack"
        return serialization.from_bytes(target, p.read_bytes()) if p.exists() else None
