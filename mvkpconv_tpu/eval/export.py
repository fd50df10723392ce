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


# ---------------------------------------------------------------------------
# Whole-scene export: the reference's actual test workload (test_models.py
# voting over full clouds) as ONE serialized program.
# ---------------------------------------------------------------------------


def cover_centers(points, in_radius: float, core_ratio: float = 0.7):
    """Deterministic sphere centers whose CORE regions cover the cloud.

    Serving replaces the reference tester's stochastic potential sweep
    (utils/tester.py:90-185) with a static grid: occupied cells of pitch
    ``2·core_radius/√3`` (so every point lies within the core radius of
    its cell's centroid), centers at the per-cell point centroids.

    Returns (S, 3) float32, numpy (host-side helper).
    """
    import numpy as np

    core_r = core_ratio * in_radius
    pitch = 2.0 * core_r / np.sqrt(3.0)
    cells = np.floor(points / pitch).astype(np.int64)
    _, inverse, counts = np.unique(
        cells, axis=0, return_inverse=True, return_counts=True
    )
    sums = np.zeros((len(counts), 3), np.float64)
    np.add.at(sums, inverse, points)
    return (sums / counts[:, None]).astype(np.float32)


def pad_centers(centers, num_centers: int):
    """Pad/trim a ``cover_centers`` result to the artifact's static count.

    Padding repeats existing centers — repeated spheres add identical
    probabilities and counts, so the mean accumulation is unchanged.
    """
    import numpy as np

    if len(centers) >= num_centers:
        if len(centers) > num_centers:
            raise ValueError(
                f"{len(centers)} cover centers exceed the artifact's "
                f"static budget {num_centers}; re-export with a larger "
                f"num_centers"
            )
        return centers
    reps = -(-num_centers // len(centers))
    return np.tile(centers, (reps, 1))[:num_centers]


def scene_spec_for(cfg, max_points: int, num_centers: int):
    """ShapeDtypeStruct pytree of the whole-scene serving contract."""
    f32 = jnp.float32
    base_dim = cfg.in_features_dim - cfg.feature_2d_dim
    spec = {
        "points": jax.ShapeDtypeStruct((max_points, 3), f32),
        "mask": jax.ShapeDtypeStruct((max_points,), jnp.bool_),
        "features": jax.ShapeDtypeStruct((max_points, base_dim), f32),
        "centers": jax.ShapeDtypeStruct((num_centers, 3), f32),
    }
    if cfg.fusion != "none":
        spec["feature_2d3d"] = jax.ShapeDtypeStruct(
            (max_points, cfg.feature_2d_dim), f32
        )
    return spec


def export_whole_scene(
    model,
    cfg,
    kind: str,
    variables,
    max_points: int,
    num_centers: int,
    core_ratio: float = 0.7,
    platforms: Optional[Sequence[str]] = None,
    allow_custom_calls: Sequence[str] = (),
) -> bytes:
    """Serialize a FULL-CLOUD inference program (scene → per-point probs).

    The artifact embeds the sphere sweep the reference runs in host Python
    (KPConv-PyTorch/test_models.py + utils/tester.py cloud_segmentation_
    test): ``lax.scan`` over ``centers`` in chunks of ``cfg.batch_num``;
    each chunk extracts its spheres on device (top-``num_points[0]``
    nearest to the center, radius/shadow masked), runs the trunk, and
    mean-accumulates core-region probabilities (within ``core_ratio·
    in_radius`` of the center — tester.py:90,179) into per-point buffers.

    Input contract (see :func:`scene_spec_for`):
      points (Nmax,3) shadow-padded subsampled cloud · mask (Nmax,) ·
      features (Nmax, base_dim) precomputed point features ·
      centers (S,3) from :func:`cover_centers`/:func:`pad_centers` ·
      [fusion configs] feature_2d3d (Nmax, 64) precomputed lifted 2D
      features (eval/precompute.py whole-scene pass — the
      architectures_new.py precomputed route).

    Returns StableHLO bytes; the loaded artifact returns
    ``{"probs": (Nmax, C), "votes": (Nmax,)}`` — ``votes`` counts core
    predictions per point (0 ⇒ the centers missed it).
    """
    from mvkpconv_tpu.ops.common import SHADOW_COORD

    apply_fn = make_apply_fn(model, cfg, kind)
    frozen = jax.device_get(variables)
    n0 = cfg.num_points[0]
    bsz = cfg.batch_num
    if num_centers % bsz != 0:
        raise ValueError(
            f"num_centers={num_centers} must be a multiple of "
            f"batch_num={bsz} (centers sweep in batch-size chunks)"
        )
    r2 = float(cfg.in_radius) ** 2
    core2 = (core_ratio * float(cfg.in_radius)) ** 2
    with_2d = cfg.fusion != "none"

    def infer_scene(scene):
        pts, msk = scene["points"], scene["mask"]
        nmax = pts.shape[0]

        def step(carry, cb):
            psum, cnt = carry
            d2 = jnp.sum((pts[None] - cb[:, None]) ** 2, -1)  # (B, Nmax)
            d2 = jnp.where(msk[None], d2, jnp.inf)
            neg, idx = jax.lax.top_k(-d2, n0)
            d2s = -neg
            valid = d2s < r2
            sphere = jnp.where(
                valid[..., None], pts[idx] - cb[:, None], SHADOW_COORD
            )
            batch = {
                "points": sphere,
                "mask": valid,
                "features": scene["features"][idx],
            }
            if with_2d:
                batch["feature_2d3d"] = scene["feature_2d3d"][idx]
            logits, _ = apply_fn(frozen, batch, False, False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            core = (valid & (d2s < core2)).astype(jnp.float32)
            rows = (probs * core[..., None]).reshape(-1, probs.shape[-1])
            flat = jnp.where(valid, idx, nmax).reshape(-1)  # invalid → drop
            psum = psum.at[flat].add(rows, mode="drop")
            cnt = cnt.at[flat].add(core.reshape(-1), mode="drop")
            return (psum, cnt), None

        init = (
            jnp.zeros((nmax, cfg.num_classes), jnp.float32),
            jnp.zeros((nmax,), jnp.float32),
        )
        (psum, cnt), _ = jax.lax.scan(
            step, init, scene["centers"].reshape(-1, bsz, 3)
        )
        return {
            "probs": psum / jnp.maximum(cnt, 1.0)[:, None],
            "votes": cnt,
        }

    spec = scene_spec_for(cfg, max_points, num_centers)
    exp = jax_export.export(
        jax.jit(infer_scene),
        platforms=tuple(platforms) if platforms else None,
        disabled_checks=[
            jax_export.DisabledSafetyCheck.custom_call(t)
            for t in allow_custom_calls
        ],
    )(spec)
    return bytes(exp.serialize())
