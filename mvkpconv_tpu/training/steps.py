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
    mesh=None,
):
    """Build the jitted training step (forward+backward+update).

    ``mesh`` — the jax.sharding.Mesh the caller shards batches over (the
    same one handed to Trainer / parallel.shard_batch). Threading it here
    lets the banded gather-transpose run shard-local (shard_map over the
    data axis) instead of degrading on multi-chip meshes.
    """

    import warnings

    from mvkpconv_tpu.ops.gather import gather_transpose

    mode = getattr(cfg, "gather_transpose", "scatter")
    gmesh = mesh
    if mode.startswith("banded"):
        if mesh is not None:
            # shard_map over the mesh's data axis keeps the banded Pallas
            # kernel fully shard-local (ops/gather.py:_transpose_banded_
            # sharded) — no fallback, the +41% train win survives scale-out.
            pass
        else:
            # No mesh threaded in, but the caller may still GSPMD-shard
            # the batch (jit infers shardings from inputs). The banded
            # Pallas kernel is a custom call the partitioner cannot split:
            # it would force operand replication. When this process sees
            # multiple ACCELERATOR devices the inputs may live on any of
            # them, so fall back to the scatter transpose. Multi-device
            # CPU (the test platform) keeps banded: there the kernel runs
            # in interpret mode (pure jax ops), which partitions fine.
            try:
                plat = jax.devices()[0].platform
                n_dev = len(jax.devices())
            except RuntimeError:
                plat, n_dev = "cpu", 1
            if n_dev > 1 and plat != "cpu":
                warnings.warn(
                    "gather_transpose is banded but no mesh was passed to "
                    "make_train_step in a multi-accelerator process — "
                    "falling back to the scatter transpose. Pass the mesh "
                    "(make_train_step(..., mesh=mesh)) to keep the banded "
                    "kernel shard-local."
                )
                mode = "scatter"
    if mode == "banded_bf16":
        # one-time notice (ADVICE r4): this mode quantizes f32 cotangent
        # rows to bf16 in the gather VJP — inexact gradients, measured
        # convergence-neutral on the reference protocol (RESULTS.md s9).
        warnings.warn(
            "gather_transpose='banded_bf16' quantizes gather-VJP cotangent "
            "rows to bf16 (f32 accumulation) for a single MXU pass — "
            "convergence-verified on this model family but not exact; set "
            "gather_transpose='banded' or 'scatter' for exact gradients."
        )

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

        # The scope is active while THIS body traces: every group_points
        # call site inside captures (mode, mesh) statically into its
        # custom_vjp params — steps built with different configs coexist
        # in one process (no module-global mode, ADVICE r4).
        with gather_transpose(mode, mesh=gmesh):
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
