"""MV-KPConv: multi-view 2D features fused into KPConv (three variants).

Re-design of the reference's fusion architectures:
  * early  — KPConv-PyTorch/models/architectures_sphere.py:61-370
    (``KPFCNN_featureAggre``): lifted 64-d 2D features are concatenated into
    the level-0 input features before the encoder;
  * middle — architectures_sphere_middle_fusion.py:59-319: two parallel
    encoders (3D-geometry features vs 2D-lifted features); skip features are
    the concat of both streams; bottlenecks merged by element-wise mean
    before a shared decoder. (The committed reference declares the first
    decoder in_dim as the *sum* of stream dims while executing the mean —
    an inconsistency; we implement the self-consistent mean variant.)
  * late   — architectures_sphere_late_fusion.py:56-370: KPConv runs on 3D
    features only; the lifted 64-d feature is concatenated with the decoder
    output right before the head.

The 2D network runs in-graph (frozen by default, matching config.path_2D
loading + freezing at architectures_sphere.py:226-237). The 2D→3D lifting
(depth unprojection + pixel kNN + FeatureAggregation) is the on-device
``ops.unproject`` path; batches may either carry precomputed ``knn_indices``
/ ``image_xyz`` or raw ``depth``/``intrinsics``/``poses`` from which they
are derived inside jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvkpconv_tpu.models.feature_aggregation import FeatureAggregation
from mvkpconv_tpu.models.kpfcnn import (
    KPFCNNDecoder,
    KPFCNNEncoder,
    KPFCNNHead,
    make_influence_cache,
    plan_architecture,
)
from mvkpconv_tpu.ops import (
    group_points,
    group_points_packed,
    points_to_pixel_knn,
    unproject_depth,
)
from mvkpconv_tpu.ops.unproject import points_to_pixel_knn_projective
from mvkpconv_tpu.ops.pyramid import Pyramid
from mvkpconv_tpu.models.unet2d import UNetResNet34


class MVKPConv(nn.Module):
    """KPFCNN with multi-view 2D feature fusion (cfg.fusion selects variant).

    Inputs (batch dict):
      features: (B, N0, C3d) base 3D features (ones ⊕ z / rgb / xyz, as
        assembled by the data pipeline per cfg.in_features_dim — matching
        ScanNet_sphere_color.py:725-790 feature switches). For early fusion
        C3d = cfg.in_features_dim − feature_2d_dim.
      images: (B, V, H, W, 3) normalized RGB.
      EITHER image_xyz (B, V, H, W, 3) + knn_indices (B, N0, K)
      OR     depth (B, V, H, W) + intrinsics (B, V, 3, 3) + poses (B, V, 4, 4).
    """

    cfg: Any
    freeze_2d: bool = True

    def setup(self):
        cfg = self.cfg
        self.net_2d = UNetResNet34(
            cfg.num_classes, dtype=cfg.compute_dtype, name="net_2d"
        )
        self.feat_aggreg = FeatureAggregation(
            cfg.feature_2d_dim, dtype=cfg.compute_dtype, name="feat_aggreg"
        )
        if cfg.fusion == "early":
            enc, dec, _ = plan_architecture(cfg)
            self.encoder = KPFCNNEncoder(cfg, tuple(enc), name="encoder")
            self.decoder = KPFCNNDecoder(cfg, tuple(dec), name="decoder")
        elif cfg.fusion == "middle":
            cfg3d = cfg.replace(in_features_dim=cfg.in_features_dim - cfg.feature_2d_dim)
            cfg2d = cfg.replace(in_features_dim=cfg.feature_2d_dim + 1)
            enc3, dec3, _ = plan_architecture(cfg3d)
            enc2, _, _ = plan_architecture(cfg2d)
            self.encoder = KPFCNNEncoder(cfg3d, tuple(enc3), name="encoder_3d")
            self.encoder_2d = KPFCNNEncoder(cfg2d, tuple(enc2), name="encoder_2d")
            # decoder consumes concat-of-streams skips: double the skip dims
            # by re-planning with doubled recorded skip widths
            dec = [
                (name, in_dim + extra, out_dim, r, layer, concat)
                for (name, in_dim, out_dim, r, layer, concat), extra in zip(
                    dec3, _middle_skip_extras(cfg3d, cfg2d)
                )
            ]
            self.decoder = KPFCNNDecoder(cfg, tuple(dec), name="decoder")
        elif cfg.fusion == "late":
            cfg3d = cfg.replace(in_features_dim=cfg.in_features_dim - cfg.feature_2d_dim)
            enc, dec, _ = plan_architecture(cfg3d)
            self.encoder = KPFCNNEncoder(cfg3d, tuple(enc), name="encoder")
            self.decoder = KPFCNNDecoder(cfg3d, tuple(dec), name="decoder")
        else:
            raise ValueError(f"MVKPConv requires fusion in early/middle/late, got {cfg.fusion!r}")
        self.head = KPFCNNHead(cfg, name="head")

    def lift_2d_features(self, batch: Dict[str, jnp.ndarray], points, train: bool):
        """UNet over all views → gather K pixels per point → aggregate to 64-d.

        Mirrors architectures_sphere.py:242-284 (per-scene group_points by
        precomputed kNN pixel indices + FeatureAggregation), with the kNN
        computed on device when raw depth/poses are provided.
        """
        images = batch["images"]
        b, v, h, w, _ = images.shape
        if "image_xyz" in batch:
            image_xyz = batch["image_xyz"]
        else:
            image_xyz, _ = unproject_depth(
                batch["depth"], batch["intrinsics"], batch["poses"]
            )
        if "knn_indices" in batch:
            knn_idx = batch["knn_indices"]
        elif self.cfg.pixel_assoc == "projective" and "poses" in batch:
            knn_idx = points_to_pixel_knn_projective(
                points, image_xyz, batch["intrinsics"], batch["poses"],
                self.cfg.pixel_knn, window=self.cfg.pixel_window,
                method=getattr(self.cfg, "pixel_select", "approx"),
                patch_dtype=jnp.dtype(
                    getattr(self.cfg, "pixel_patch_dtype", "float32")
                ),
            )
        else:
            knn_idx = points_to_pixel_knn(
                points, image_xyz, self.cfg.pixel_knn,
                method=self.cfg.neighbor_method,
            )

        train_2d = train and not self.freeze_2d
        preds = self.net_2d(images.reshape(b * v, h, w, 3), train=train_2d)
        # round to compute_dtype BEFORE the gather: the aggregation MLP's
        # Dense casts its input to compute_dtype anyway (bf16→f32→bf16 is
        # exact), so this is numerically free and unlocks the packed
        # half-source gather below (the UNet's trailing BN upcasts to f32)
        feat = preds["feature"].reshape(b, v * h * w, -1).astype(
            self.cfg.compute_dtype
        )
        if self.freeze_2d:
            feat = jax.lax.stop_gradient(feat)
        # ONE gather for pixel positions ⊕ features (identical indices; TPU
        # gathers are start-bound). At this source size (B·V·H·W = 384k
        # rows) the start rate is source-byte-sensitive (65M vs 144M
        # starts/s f32 vs bf16, scratch/prof_lift_gather.py), so when the
        # UNet features are bf16 they ride the gather PACKED into f32
        # lanes — numerically exact, xyz stays f32 (ops/gather.py:
        # group_points_packed).
        xyz_src = image_xyz.reshape(b, v * h * w, 3).astype(jnp.float32)
        if feat.dtype == jnp.bfloat16 and feat.shape[-1] % 2 == 0:
            pixel_xyz, pixel_feat = group_points_packed(
                xyz_src, feat, knn_idx
            )
        else:
            payload = jnp.concatenate(
                [xyz_src, feat.astype(jnp.float32)], axis=-1
            )
            grouped = group_points(payload, knn_idx)  # (B, N, K, 3+64)
            pixel_xyz = grouped[..., :3]
            pixel_feat = grouped[..., 3:]
        return self.feat_aggreg(pixel_xyz, points, pixel_feat, train)

    def __call__(self, batch: Dict[str, jnp.ndarray], pyr: Pyramid, train: bool = False):
        cfg = self.cfg
        points0 = pyr.points[0]
        if "feature_2d3d" in batch:
            # precomputed whole-scene route (architectures_new.py:273-278 /
            # eval/precompute.py): lifted features come from the dataset,
            # the 2D net does not run in-graph
            feat_2d3d = jax.lax.stop_gradient(
                batch["feature_2d3d"].astype(jnp.float32)
            )
        else:
            feat_2d3d = self.lift_2d_features(batch, points0, train)
        base = batch["features"]

        # one influence cache shared by every rigid conv block (and by both
        # middle-fusion encoders — identical geometry per level); prebuilt
        # by default — the measured winner over lazy deposits and over
        # consumer-count gating (kpfcnn.py:make_influence_cache)
        infl = make_influence_cache(
            cfg, (self.encoder.plan, self.decoder.plan), pyr
        )
        if cfg.fusion == "early":
            x = jnp.concatenate([base, feat_2d3d], axis=-1)
            x, skips = self.encoder(x, pyr, train, infl=infl)
            x = self.decoder(x, skips, pyr, train, infl=infl)
        elif cfg.fusion == "middle":
            x3d, skips3d = self.encoder(base, pyr, train, infl=infl)
            ones = jnp.ones_like(feat_2d3d[..., :1])
            x2d, skips2d = self.encoder_2d(
                jnp.concatenate([ones, feat_2d3d], axis=-1), pyr, train,
                infl=infl,
            )
            x = 0.5 * (x3d + x2d)
            skips = [jnp.concatenate([a, b], axis=-1) for a, b in zip(skips3d, skips2d)]
            x = self.decoder(x, skips, pyr, train, infl=infl)
        else:  # late
            x, skips = self.encoder(base, pyr, train, infl=infl)
            x = self.decoder(x, skips, pyr, train, infl=infl)
            x = jnp.concatenate([x, feat_2d3d], axis=-1)
        return self.head(x, pyr.masks[0], train)


def _middle_skip_extras(cfg3d, cfg2d):
    """Per-decoder-block extra skip width from the 2D stream.

    Middle fusion concatenates the two streams' skip features
    (architectures_sphere_middle_fusion.py:100-102,293-304), so each decoder
    concat block sees skip_dims_3d[layer] + skip_dims_2d[layer]. The two
    streams share out_dim bookkeeping, so their skip dims only ever differ
    if a strided block is first in the architecture (never the case for the
    reference architectures, which open with 'simple').
    """
    _, dec, _ = plan_architecture(cfg3d)
    _, _, skip_dims_2d = plan_architecture(cfg2d)
    return [skip_dims_2d[layer_ind] if concat else 0
            for (_n, _i, _o, _r, layer_ind, concat) in dec]
