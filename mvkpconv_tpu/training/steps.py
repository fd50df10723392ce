"""Train/eval step factories: one jitted SPMD program per step.

Everything the reference did across CPU workers + GPU per step — pyramid
building (datasets/common.py:536-652), forward, loss, clipped SGD update,
BN-stat update — is one XLA program here. Batches are dense (B, ...) arrays;
with a mesh, the leading dim is sharded over the ``data`` axis and XLA
inserts the gradient all-reduce (replicated params, sharded batch).

Batch dict contract (produced by mvkpconv_tpu.data pipelines):
  points   (B, N0, 3)   shadow-padded sphere/chunk points
  mask     (B, N0)      validity
  features (B, N0, C)   base 3D features (ones ⊕ z/rgb/xyz columns)
  labels   (B, N0)      int32 in [0, C) or ignore_label
  [fusion] images / image_xyz / knn_indices / depth / intrinsics / poses
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.losses import segmentation_cross_entropy


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def make_apply_fn(model, cfg, kind: str) -> Callable:
    """Uniform ``apply(variables, batch, train, mutable) -> (logits, vars)``
    over the three model families."""
    spec = cfg.pyramid_spec() if kind in ("kpfcnn", "mvkpconv") else None

    def apply_fn(variables, batch, train: bool, mutable, rngs=None):
        kw = dict(train=train, mutable=mutable)
        if rngs is not None and train:
            kw["rngs"] = rngs
        if kind == "kpfcnn":
            pyr = build_pyramid(batch["points"], batch["mask"], spec)
            out = model.apply(variables, batch["features"], pyr, **kw)
        elif kind == "mvkpconv":
            pyr = build_pyramid(batch["points"], batch["mask"], spec)
            out = model.apply(variables, batch, pyr, **kw)
        elif kind == "mvpnet":
            out = model.apply(variables, batch, **kw)
        elif kind == "pn2":
            out = model.apply(
                variables, batch["points"], batch.get("features"), **kw
            )
        elif kind == "unet2d":
            out = model.apply(variables, batch["images"], **kw)
            if mutable:
                out = (out[0]["seg_logit"], out[1])
            else:
                out = out["seg_logit"]
        else:
            raise ValueError(f"unknown model kind {kind!r}")
        return out if mutable else (out, None)

    return apply_fn


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    cfg,
    loss_fn: Callable = segmentation_cross_entropy,
    donate: bool = True,
):
    """Build the jitted training step (forward+backward+update)."""

    from mvkpconv_tpu.ops.gather import set_gather_transpose

    # module-level, read at backward TRACE time (i.e. inside this step's
    # first jit execution) — the eval/inference paths never reach it
    mode = getattr(cfg, "gather_transpose", "scatter")
    mesh_devices = 1
    for d in getattr(cfg, "mesh_shape", (1,)):
        mesh_devices *= d
    if mode.startswith("banded"):
        # the banded Pallas kernel is a custom call with no GSPMD
        # partitioning rule: under a real multi-chip mesh the partitioner
        # would force operand replication (an all-gather of the cotangent
        # rows). Fall back to the scatter transpose when the config
        # declares a multi-device mesh OR the process sees multiple
        # accelerator devices. CPU device meshes keep the banded path:
        # there the kernel runs in interpret mode (pure jax ops), which
        # GSPMD partitions fine — that is also what keeps the sharded
        # CPU tests exercising it.
        try:
            plat = jax.devices()[0].platform
            n_dev = len(jax.devices())
        except RuntimeError:
            plat, n_dev = "cpu", 1
        if mesh_devices > 1 or (n_dev > 1 and plat in ("tpu", "axon")):
            mode = "scatter"
    set_gather_transpose(mode)

    has_deform = any("deform" in b for b in getattr(cfg, "architecture", ()))
    mutable = ["batch_stats"] + (["intermediates"] if has_deform else [])

    def step(state: TrainState, batch) -> tuple:
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(0), state.step)}

        def compute_loss(params):
            (logits, updates) = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                True,
                mutable,
                rngs=rngs,
            )
            loss = loss_fn(
                logits,
                batch["labels"],
                batch.get("mask"),
                class_weights=jnp.asarray(cfg.class_weights)
                if cfg.class_weights is not None
                else None,
                ignore_label=cfg.ignore_label,
                label_smoothing=getattr(cfg, "label_smoothing", 0.0),
                balance=getattr(cfg, "segloss_balance", "none"),
            )
            if has_deform:
                from mvkpconv_tpu.training.losses import deform_regularization

                loss = loss + deform_regularization(
                    updates["intermediates"],
                    cfg.repulse_extent,
                    cfg.deform_fitting_power,
                )
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=updates["batch_stats"] if updates else state.batch_stats,
            opt_state=opt_state,
        )
        valid = batch["labels"] != cfg.ignore_label
        if "mask" in batch:
            valid = valid & batch["mask"]
        pred = jnp.argmax(logits, axis=-1)
        acc = jnp.sum((pred == batch["labels"]) & valid) / jnp.maximum(
            jnp.sum(valid), 1
        )
        return new_state, {"loss": loss, "accuracy": acc}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, cfg):
    """Jitted eval step returning per-point probabilities (for the voting
    tester and validation smoothing, tester.py:79-376)."""

    def step(state: TrainState, batch):
        logits, _ = apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            False,
            False,
        )
        return jax.nn.softmax(logits, axis=-1)

    return jax.jit(step)
