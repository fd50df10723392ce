"""Serving export: freeze a trained model into a self-contained artifact.

The reference has no deployment story — its eval scripts re-instantiate
torch modules from a checkpoint and require the full source tree
(KPConv-PyTorch/test_models.py:34-120, mvpnet/test.py). Here the
deployment unit is TPU-native: ONE serialized XLA program
(``jax.export`` → StableHLO bytes) containing the whole inference step —
on-device pyramid build, 2D UNet over the views, 2D→3D lifting, KPConv
trunk, softmax — with the trained weights baked in as constants. The
artifact is loadable and runnable without the model code, Python config,
or checkpoint machinery, and can be lowered for serving platforms other
than the exporting host (``platforms=("tpu", "cpu")``).

Static shapes are a feature, not a limitation: the framework's batch
contract is already fixed-shape (shadow-padded spheres/chunks), exactly
what an XLA serving binary wants.

Caveat: platform-specialized kernels are chosen at TRACE time — exporting
on a CPU host bakes the XLA ``approx`` neighbor path even when lowering
for TPU. Export on the target platform (or pass
``cfg.replace(neighbor_method="approx")``) when that matters.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from mvkpconv_tpu.training.steps import make_apply_fn


def batch_spec_for(cfg, kind: str, batch_num: Optional[int] = None):
    """ShapeDtypeStruct pytree of the inference batch contract for ``cfg``.

    Mirrors the batch dict produced by the data pipelines (steps.py module
    docstring): ``kpfcnn`` consumes points/mask/features; ``mvkpconv``
    additionally the multi-view image geometry; ``mvpnet`` the raw
    RGB-D-geometry chunk contract (image_xyz + pixel kNN are computed
    on-device inside the exported program).
    """
    b = batch_num or cfg.batch_num
    n0 = cfg.num_points[0]
    f32 = jnp.float32
    v, h, w = cfg.num_views, cfg.image_height, cfg.image_width
    geom = dict(
        images=jax.ShapeDtypeStruct((b, v, h, w, 3), f32),
        depth=jax.ShapeDtypeStruct((b, v, h, w), f32),
        intrinsics=jax.ShapeDtypeStruct((b, v, 3, 3), f32),
        poses=jax.ShapeDtypeStruct((b, v, 4, 4), f32),
    )
    if kind == "mvpnet":
        return {"points": jax.ShapeDtypeStruct((b, n0, 3), f32), **geom}
    spec: Dict[str, jax.ShapeDtypeStruct] = {
        "points": jax.ShapeDtypeStruct((b, n0, 3), f32),
        "mask": jax.ShapeDtypeStruct((b, n0), jnp.bool_),
        "features": jax.ShapeDtypeStruct(
            (b, n0, cfg.in_features_dim - cfg.feature_2d_dim), f32
        ),
    }
    if kind == "mvkpconv":
        spec.update(geom)
    elif kind != "kpfcnn":
        raise ValueError(
            f"no default batch spec for kind {kind!r}; pass batch_spec"
        )
    return spec


def export_inference(
    model,
    cfg,
    kind: str,
    variables,
    batch_spec=None,
    platforms: Optional[Sequence[str]] = None,
    allow_custom_calls: Sequence[str] = (),
) -> bytes:
    """Serialize the full inference step (batch → per-point class probs).

    Args:
      model/cfg/kind: as for ``training.steps.make_apply_fn``.
      variables: trained ``{'params', 'batch_stats'}`` — baked into the
        program as constants (the artifact is self-contained).
      batch_spec: optional pytree of ``jax.ShapeDtypeStruct`` overriding
        :func:`batch_spec_for` (required for ``mvpnet``).
      platforms: lowering platforms (e.g. ``("tpu", "cpu")``); default is
        the exporting host's platform.
      allow_custom_calls: custom-call targets to exempt from jax.export's
        forward-compatibility check. A TPU-platform export of the default
        config contains the Pallas bin-min neighbor kernel
        (``tpu_custom_call``), which is stable only for the exporting
        jaxlib generation — pass ``("tpu_custom_call",)`` (the CLI's
        ``--allow-custom-calls``) for same-fleet serving, or export with
        ``cfg.replace(neighbor_method="approx")`` for a fully stable
        artifact.

    Returns:
      StableHLO serialization bytes (write with :func:`save_exported`).
    """
    apply_fn = make_apply_fn(model, cfg, kind)
    frozen = jax.device_get(variables)  # constants, not tracers

    def infer(batch):
        logits, _ = apply_fn(frozen, batch, False, False)
        return jax.nn.softmax(logits, axis=-1)

    spec = batch_spec if batch_spec is not None else batch_spec_for(cfg, kind)
    exp = jax_export.export(
        jax.jit(infer),
        platforms=tuple(platforms) if platforms else None,
        disabled_checks=[
            jax_export.DisabledSafetyCheck.custom_call(t)
            for t in allow_custom_calls
        ],
    )(spec)
    return bytes(exp.serialize())


def save_exported(data: bytes, path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path


class ServingModel:
    """A loaded serving artifact: ``probs = ServingModel.load(p)(batch)``.

    Wraps ``jax.export.deserialize``; runs without any mvkpconv_tpu model
    code (only this loader). ``in_avals``/``platforms`` expose the baked
    batch contract for request validation at the serving edge.
    """

    def __init__(self, exported: "jax_export.Exported"):
        self._exported = exported

    @classmethod
    def from_bytes(cls, data: bytes) -> "ServingModel":
        return cls(jax_export.deserialize(bytearray(data)))

    @classmethod
    def load(cls, path) -> "ServingModel":
        return cls.from_bytes(Path(path).read_bytes())

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self._exported.platforms)

    @property
    def in_avals(self):
        return self._exported.in_avals

    def __call__(self, batch) -> jnp.ndarray:
        return self._exported.call(batch)


def infer_kind(cfg) -> str:
    """Model family from config (mirrors tools/common.py construction)."""
    return "kpfcnn" if cfg.fusion == "none" else "mvkpconv"
