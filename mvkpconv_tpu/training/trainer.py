"""Iteration-based trainer.

One harness replaces both of the reference's (SURVEY.md §7.6): the mvpnet
iteration-based solver (mvpnet/train_2d.py:58-321) and the KPConv epoch
trainer (utils/trainer.py:48-537). Semantics kept:
  * periodic validation with best-metric checkpointing (train_2d.py:304-313);
  * ``training.txt`` convergence log + val IoU log (trainer.py:216-225);
  * graceful stop by deleting the ``running_PID.txt`` kill file
    (trainer.py:133-165);
  * checkpoint-gap snapshots + last/auto-resume (trainer.py:247-261).

The trainer is model-agnostic: it consumes a jitted ``train_step`` from
training.steps and an iterator of dense batches; with a mesh, batches are
sharded over the data axis before each step.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import jax
import numpy as np

from mvkpconv_tpu.parallel import shard_batch
from mvkpconv_tpu.training.checkpoint import Checkpointer
from mvkpconv_tpu.training.logger import (
    MetricLogger,
    ScalarLog,
    TrainingLog,
    ValIoULog,
    setup_logger,
)


class Trainer:
    def __init__(
        self,
        train_step: Callable,
        state,
        output_dir: str,
        cfg,
        mesh=None,
        eval_fn: Optional[Callable] = None,
        log_period: int = 50,
        val_period: int = 0,  # 0 = once per epoch
        max_to_keep: int = 5,
        profile_steps: int = 0,  # capture a profiler trace of steps [2, 2+N)
    ):
        self.train_step = train_step
        self.state = state
        self.cfg = cfg
        self.mesh = mesh
        self.eval_fn = eval_fn
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.logger = setup_logger(output_dir=str(self.output_dir))
        self.meters = MetricLogger()
        self.training_log = TrainingLog(self.output_dir)
        self.scalar_log = ScalarLog(self.output_dir)
        self.val_iou_log = ValIoULog(self.output_dir)
        self.checkpointer = Checkpointer(self.output_dir / "checkpoints", max_to_keep)
        self.log_period = log_period
        self.val_period = val_period or cfg.epoch_steps
        self.best_metric = -np.inf
        self.kill_file = self.output_dir / "running_PID.txt"
        self.profile_steps = profile_steps
        self._profiling = False
        cfg.save(self.output_dir / "parameters.txt")

    def _maybe_profile(self, local_step: int):
        """Capture a jax.profiler trace (XPlane, viewable in TB/xprof) over
        a few post-warmup steps — the structured-profiling capability the
        reference only approximates with wall-clock meters (SURVEY §5).
        Best-effort: profiling may be unavailable through device relays."""
        if not self.profile_steps:
            return
        try:
            if local_step == 2 and not self._profiling:
                jax.profiler.start_trace(str(self.output_dir / "profile"))
                self._profiling = True
            elif self._profiling and local_step >= 2 + self.profile_steps:
                jax.profiler.stop_trace()
                self._profiling = False
                self.profile_steps = 0
                self.logger.info(
                    "profiler trace written to %s", self.output_dir / "profile"
                )
        except Exception as e:  # relay backends may not support tracing
            self.logger.warning("profiler capture unavailable: %s", e)
            self.profile_steps = 0
            self._profiling = False

    def maybe_resume(self):
        restored = self.checkpointer.restore(jax.device_get(self.state))
        if restored is not None:
            self.state = jax.device_put(restored)
            self.logger.info(
                "resumed from step %d", int(np.asarray(restored.step))
            )

    def fit(
        self,
        batches: Iterable,
        max_steps: Optional[int] = None,
        prefetch_depth: int = 2,
    ):
        """Run the training loop over an (in)finite batch iterator.

        The iterator is wrapped in a background prefetch thread so the next
        host batch is assembled while the device runs (the reference's
        10-worker DataLoader overlap, SURVEY §2.5); ``prefetch_depth=0``
        disables it.
        """
        self.kill_file.write_text(str(os.getpid()))
        max_steps = max_steps or self.cfg.max_epoch * self.cfg.epoch_steps
        if prefetch_depth > 0:
            from mvkpconv_tpu.data.prefetch import prefetch

            batches = prefetch(batches, depth=prefetch_depth)
        t_data = time.time()
        local_step = 0
        for batch in batches:
            step = int(np.asarray(self.state.step))
            if step >= max_steps:
                break
            self._maybe_profile(local_step)
            local_step += 1
            if not self.kill_file.exists():  # graceful stop (trainer.py:133-137)
                self.logger.info("kill file removed — stopping gracefully")
                break
            data_time = time.time() - t_data
            if self.mesh is not None:
                if jax.process_count() > 1:
                    # multi-host: this process's batches iterator yields the
                    # LOCAL slice (local_batch_size spheres over its
                    # shard_scenes slice); assemble the global jax.Array
                    from mvkpconv_tpu.parallel import global_batch_from_local

                    batch = global_batch_from_local(batch, self.mesh)
                else:
                    batch = shard_batch(batch, self.mesh)
            t0 = time.time()
            self.state, stats = self.train_step(self.state, batch)
            stats = {k: float(np.asarray(v)) for k, v in stats.items()}
            step_time = time.time() - t0
            self.meters.update(data=data_time, time=step_time, **stats)
            step += 1
            epoch = step // self.cfg.epoch_steps
            if step % self.log_period == 0:
                self.logger.info("step %d (epoch %d): %s", step, epoch, self.meters)
                self.scalar_log.log(
                    step, data_time=data_time, step_time=step_time, **stats
                )
            self.training_log.append(
                epoch, step, stats.get("loss", 0.0), stats.get("offset_loss", 0.0),
                stats.get("accuracy", 0.0),
            )
            if step % self.val_period == 0:
                self._validate_and_checkpoint(step, epoch)
            t_data = time.time()
        # final snapshot
        self._validate_and_checkpoint(int(np.asarray(self.state.step)), -1)
        if self.kill_file.exists():
            self.kill_file.unlink()
        return self.state

    def _validate_and_checkpoint(self, step: int, epoch: int):
        metric = None
        if self.eval_fn is not None:
            metric = self.eval_fn(self.state)
            self.logger.info("validation @ step %d: %s", step, metric)
            if isinstance(metric, dict):
                if "class_iou" in metric:
                    # reference's per-class val_IoUs.txt (trainer.py:445-452)
                    self.val_iou_log.append(metric["class_iou"])
                self.scalar_log.log(
                    step,
                    **{
                        f"val_{k}": v
                        for k, v in metric.items()
                        if np.ndim(v) == 0
                    },
                )
                metric = metric.get("miou", metric.get("accuracy"))
        is_best = metric is not None and metric > self.best_metric
        if is_best:
            self.best_metric = metric
        self.checkpointer.save(jax.device_get(self.state), step, is_best=is_best)
