"""Configuration for KPConv-family models and training.

Re-design of KPConv-PyTorch/utils/config.py (class-attribute Config with
parameters.txt round-trip) as a frozen dataclass. Field names keep the
reference vocabulary (architecture, in_radius, first_subsampling_dl,
conv_radius, KP_extent, ...) so reference configs translate 1:1; a
``save``/``load`` text round-trip keeps checkpoint dirs self-describing
(config.py:281-431). TPU-specific additions: static point/neighbor budgets,
batch size as a leading array dim, compute dtype, mesh shape.
"""

from __future__ import annotations

import ast
import dataclasses
from pathlib import Path
from typing import Any, Optional, Tuple

import jax.numpy as jnp

# The production architecture ("rigid deeper",
# train_ScanNet_sphere.py:129-150): 5 levels, 14 conv blocks, 4 upsamples.
ARCHITECTURE_DEEPER = (
    "simple",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "resnetb_strided",
    "resnetb",
    "resnetb",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
    "nearest_upsample",
    "unary",
)


@dataclasses.dataclass(frozen=True)
class KPConfig:
    """Static model + training configuration (hashable, jit-friendly)."""

    # ----- dataset / task -----
    num_classes: int = 20
    ignore_label: int = -1

    # ----- model topology (the reference's central contract) -----
    architecture: Tuple[str, ...] = ARCHITECTURE_DEEPER
    num_kernel_points: int = 15
    in_radius: float = 1.2
    first_subsampling_dl: float = 0.04
    conv_radius: float = 2.5
    deform_radius: float = 6.0
    kp_extent: float = 1.2
    kp_influence: str = "linear"  # constant | linear | gaussian
    aggregation_mode: str = "sum"  # sum | closest
    first_features_dim: int = 128
    in_features_dim: int = 66
    modulated: bool = False
    use_batch_norm: bool = True
    batch_norm_momentum: float = 0.02

    # ----- fusion (architectures_sphere*.py variants) -----
    fusion: str = "none"  # none | early | middle | late
    num_views: int = 5
    image_height: int = 120
    image_width: int = 160
    feature_2d_dim: int = 64
    use_point_color: bool = True
    pixel_knn: int = 3  # kNN pixels per point for 2D→3D lifting
    # pixel association: 'projective' searches a window around each point's
    # camera projection (near-exact, ~100× fewer pairs); 'exact' brute-forces
    # all pixels like the reference's CPU ball-tree
    pixel_assoc: str = "projective"
    pixel_window: int = 7
    # projective-window selection: 'pallas' (fused VPU kernel — d² +
    # packed top-k + in-kernel index decode; exact up to a 2⁻¹⁴ distance
    # quantization, ~3 ms/step faster than 'approx' on v5e; falls back to
    # 'minext' off-TPU), 'minext' (single-stage exact k-round argmin
    # extraction), 'approx' (per-view approx_min_k + merge), 'exact'
    # (per-view top_k + merge)
    pixel_select: str = "pallas"
    # im2col patch storage dtype for the projective association ('bfloat16'
    # halves the dominant patch-gather HBM cost; selection-only — relation
    # features always use full-precision pixel positions)
    pixel_patch_dtype: str = "bfloat16"

    # ----- deformable regularizer -----
    deform_fitting_power: float = 1.0
    repulse_extent: float = 1.2
    # LR multiplier on deformable-offset params (trainer.py:72-79 uses 0.1)
    deform_lr_factor: float = 0.1

    # ----- training -----
    max_epoch: int = 500
    epoch_steps: int = 500
    validation_size: int = 50
    checkpoint_gap: int = 50
    learning_rate: float = 1e-2
    momentum: float = 0.98
    lr_decay: float = 0.1 ** (1 / 150)  # per-epoch exponential decay
    grad_clip_value: float = 100.0  # reference clips grad VALUES at 100
    batch_num: int = 5  # spheres per device batch
    class_weights: Optional[Tuple[float, ...]] = None
    # 'none' | 'class': inverse in-batch class-frequency reweighting when no
    # explicit class_weights are set (config.py:202 segloss_balance)
    segloss_balance: str = "none"
    # target smoothing ε (common/nn/functional.py smooth_cross_entropy;
    # mvpnet cfg TRAIN.LABEL_SMOOTHING)
    label_smoothing: float = 0.0

    # ----- augmentation -----
    augment_scale_anisotropic: bool = True
    augment_symmetries: Tuple[bool, bool, bool] = (True, False, False)
    augment_rotation: str = "vertical"
    augment_scale_min: float = 0.9
    augment_scale_max: float = 1.1
    augment_noise: float = 0.001
    augment_color: float = 1.0

    # ----- TPU static budgets (replaces the reference's dynamic batch
    # packing / calibrated neighborhood limits, ScanNet_sphere.py:1249-1576) --
    num_points: Tuple[int, ...] = (16384, 4096, 1024, 256, 128)
    conv_neighbors: Tuple[int, ...] = (34, 34, 34, 34, 34)
    pool_neighbors: Tuple[int, ...] = (34, 34, 34, 34)
    # per-level budgets at deform-widened radii (deform_radius vs conv_radius
    # — the reference calibrates larger limits on deformable layers,
    # datasets/common.py:411-421); empty = reuse conv/pool_neighbors.
    # data/calibration.py emits these for architectures with deform blocks.
    deform_conv_neighbors: Tuple[int, ...] = ()
    deform_pool_neighbors: Tuple[int, ...] = ()
    # 'binmin' = fused Pallas bin-min selection (5.3× the approx path on
    # TPU, recall ~0.98 — see ops/pallas/radius_topk.py; CPU backends fall
    # back to 'approx' automatically); 'approx' = TPU-native approx_min_k
    # (safe wherever the reference already truncates neighbor lists to
    # calibrated budgets); 'exact' = full top-k sort.
    neighbor_method: str = "binmin"
    # opt-in fused Pallas KPConv kernel: measured 1.33× SLOWER than XLA's
    # own fusion of the einsum chain at production shapes (XLA fuses this
    # pattern well; the kernel's per-KP small matmuls underutilize the MXU).
    # Kept as groundwork — see ops/pallas/kpconv.py.
    use_pallas_kpconv: bool = False
    # contraction form of the KPConv K-contraction (all forms are
    # reassociation-level identical; see blocks._kp_contract /
    # blocks._resolve_tail and the round-4 measurements in RESULTS.md):
    # 'auto' (DEFAULT — 'vpu' under train, 'einsum' at eval; each is the
    # measured end-to-end winner for its mode: train 379k vs 354k pts/s,
    # infer 988k vs 958k) | 'einsum' (gather → 'bqkm,bqkc->bqmc' batched
    # dot → matmul) | 'vpu' (broadcast multiply + sum over K) |
    # 'gform_dot' | 'gform_vpu' (fold the (M,Cin,Cout) weights into
    # support features BEFORE the gather; measured 0.28×/0.20× end-to-end
    # — the M·Cout gather payload is past the ~512 B/row free-payload
    # knee — kept as the documented negative result).
    kpconv_tail: str = "auto"
    # rematerialization policy for the training step: 'none' | 'blocks'
    # (per-conv-block nn.remat — recompute gathered neighbor features and
    # the influence einsum in the backward pass instead of saving them;
    # deformable blocks are exempt because they sow intermediates).
    remat: str = "none"
    # HBM budget (MiB) for the hoisted per-level influence cache
    # (models/kpfcnn.py:build_influence_cache). The cache holds one
    # (B, Nq, K, M) tensor per (conv|pool, level) live across the whole
    # forward — ~102 MiB bf16 at bench shapes (see RESULTS.md). If the
    # analytic total exceeds this budget (e.g. very large batches), the
    # cache is skipped automatically and blocks recompute influence
    # in-place, trading ~3% step time for the HBM. 0 disables the cache.
    influence_cache_budget_mb: float = 1024.0
    # influence-sharing policy: 'prebuilt' (hoisted cache built once before
    # the trunk — the measured winner: 987.7k vs 919.6k pts/s infer and
    # 379.4k vs 344.1k train over 'lazy' in the round-4 TPU A/B, see
    # RESULTS.md) | 'lazy' (first block per level deposits its influence
    # riding its own fused gather — kept as the documented negative
    # result) | 'none' (every block recomputes in place; also the
    # automatic fallback when the analytic bytes exceed the budget).
    influence_cache: str = "prebuilt"
    # VJP of the neighbor-feature gathers (ops/gather.py): 'scatter' (XLA's
    # native take-transpose scatter-add, 58M rows/s on v5e) | 'sorted'
    # (sort-by-target + permuted gather + blocked cumsum + boundary diff —
    # loses to its own permuted take: a random HBM row read each,
    # 74.85 ms at L0) | 'window' (sorted + compressed-rank windowed
    # one-hot matmul on the MXU inside a Pallas kernel,
    # ops/pallas/segsum.py; same permute front end) | 'banded' (NO-SORT
    # windowed one-hot MXU segment sum streaming the cotangent rows in
    # natural order, exploiting the pipeline's voxel-sorted point bands —
    # shadow rows via one exact masked reduce, out-of-band rows via an
    # exact residual scatter) | 'banded_bf16' (banded + cotangent rows
    # quantized to bf16 for a single MXU pass — a measured
    # quality-for-speed knob, NOT exact). All other modes exact up to f32
    # reassociation (they ACCUMULATE in f32). The scatter path is 117.7 ms
    # of the 119 ms train-step backward at bench shapes
    # (scratch/prof_scatter_share.py); 'banded_bf16' measured 161.5 vs
    # 185.7 ms/step end-to-end (405.9k vs 352.9k pts/s) with an unchanged
    # convergence drive (loss 3.0→0.14, acc 0.946), so it is the
    # production default (make_train_step emits a one-time inexact-
    # gradient notice). On a multi-device mesh, pass the mesh to
    # make_train_step(..., mesh=...) and the banded kernel runs shard-
    # local under shard_map over the data axis — full speed at scale; a
    # multi-accelerator process that does NOT thread the mesh falls back
    # to 'scatter' (with a warning). Set 'scatter' or 'banded' for exact
    # f32 accumulation. Captured per step at trace time via the
    # ops.gather.gather_transpose scope.
    gather_transpose: str = "banded_bf16"
    compute_dtype: Any = jnp.float32
    mesh_shape: Tuple[int, ...] = (1,)

    # ------------------------------------------------------------------
    @property
    def num_layers(self) -> int:
        from mvkpconv_tpu.ops.pyramid import num_layers_from_architecture

        return num_layers_from_architecture(self.architecture)

    def pyramid_spec(self):
        from mvkpconv_tpu.ops.pyramid import (
            PyramidSpec,
            deform_flags_from_architecture,
        )

        levels = self.num_layers
        conv_flags, pool_flags = deform_flags_from_architecture(self.architecture)
        return PyramidSpec(
            num_points=tuple(self.num_points[:levels]),
            first_subsampling_dl=self.first_subsampling_dl,
            conv_radius=self.conv_radius,
            deform_radius=self.deform_radius,
            conv_neighbors=tuple(self.conv_neighbors[:levels]),
            pool_neighbors=tuple(self.pool_neighbors[: levels - 1]),
            deform_conv_levels=conv_flags,
            deform_pool_levels=pool_flags,
            deform_conv_neighbors=(
                tuple(self.deform_conv_neighbors[:levels])
                if self.deform_conv_neighbors
                else None
            ),
            deform_pool_neighbors=(
                tuple(self.deform_pool_neighbors[: levels - 1])
                if self.deform_pool_neighbors
                else None
            ),
            neighbor_method=self.neighbor_method,
        )

    def replace(self, **kwargs) -> "KPConfig":
        return dataclasses.replace(self, **kwargs)

    @property
    def base_feature_dim(self) -> int:
        """Width of the non-lifted 3D feature columns."""
        return self.in_features_dim - (
            self.feature_2d_dim if self.fusion != "none" else 0
        )

    def validate(self) -> "KPConfig":
        """Fail fast on inconsistent fusion/feature settings."""
        supported = (1, 2, 4, 5, 7)
        if self.base_feature_dim not in supported:
            raise ValueError(
                f"in_features_dim={self.in_features_dim} with fusion="
                f"{self.fusion!r} implies base feature dim "
                f"{self.base_feature_dim}; supported base dims are "
                f"{supported} (e.g. fusion='early' wants 64+base, "
                f"fusion='none' wants base alone)"
            )
        if self.fusion not in ("none", "early", "middle", "late"):
            raise ValueError(f"unknown fusion {self.fusion!r}")
        if self.kpconv_tail not in (
            "auto", "einsum", "vpu", "gform_dot", "gform_vpu"
        ):
            raise ValueError(f"unknown kpconv_tail {self.kpconv_tail!r}")
        if self.influence_cache not in ("prebuilt", "lazy", "none"):
            raise ValueError(
                f"unknown influence_cache {self.influence_cache!r}"
            )
        return self

    # ----- parameters.txt-style round trip (utils/config.py:281-431) -----
    def save(self, path) -> None:
        lines = ["# mvkpconv_tpu parameters"]
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name == "compute_dtype":
                v = jnp.dtype(v).name
            lines.append(f"{f.name} = {v!r}")
        Path(path).write_text("\n".join(lines) + "\n")

    @classmethod
    def load(cls, path) -> "KPConfig":
        kwargs = {}
        names = {f.name for f in dataclasses.fields(cls)}
        for line in Path(path).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, val = line.split("=", 1)
            key = key.strip()
            if key not in names:
                continue
            val = val.strip()
            if key == "compute_dtype":
                kwargs[key] = jnp.dtype(ast.literal_eval(val))
            else:
                kwargs[key] = ast.literal_eval(val)
        return cls(**kwargs)
