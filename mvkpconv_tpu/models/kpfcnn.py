"""KPFCNN segmentation network built from an ``architecture`` block list.

Re-design of KPConv-PyTorch/models/architectures.py:189-394 (KPFCNN). The
block-list contract is preserved: the same list of block names drives both
model construction here and pyramid budgets (ops/pyramid.py), exactly like
the reference where ``config.architecture`` drives architectures.py:219-294
and datasets/common.py:560-652 simultaneously.

The encoder/decoder dimension bookkeeping (skip dims recorded at each
strided block, decoder concat after each upsample, 'simple' halving) follows
architectures.py:219-294 so checkpoints/architectures are interchangeable at
the topology level. The head applies UnaryBlocks with default activation,
including the reference's quirk of a leaky-relu on the logits layer
(architectures.py:296-297 passes no_relu=False for head_softmax).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mvkpconv_tpu.models import blocks as B
from mvkpconv_tpu.ops.pyramid import Pyramid


def plan_architecture(cfg) -> Tuple[list, list, list]:
    """Python-time pass over the block list computing dims/radii/levels.

    Returns (encoder_plan, decoder_plan, skip_dims) where each plan entry is
    ``(block_name, in_dim, out_dim, radius, layer_ind, concat_skip)``.
    """
    layer = 0
    r = cfg.first_subsampling_dl * cfg.conv_radius
    in_dim = cfg.in_features_dim
    out_dim = cfg.first_features_dim

    encoder, skip_dims = [], []
    arch = list(cfg.architecture)
    start_i = len(arch)
    for i, block in enumerate(arch):
        if any(t in block for t in ("pool", "strided", "upsample", "global")):
            skip_dims.append(in_dim)
        if "upsample" in block:
            start_i = i
            break
        encoder.append((block, in_dim, out_dim, r, layer, False))
        in_dim = out_dim // 2 if "simple" in block else out_dim
        if "pool" in block or "strided" in block:
            layer += 1
            r *= 2
            out_dim *= 2

    decoder = []
    for j, block in enumerate(arch[start_i:]):
        concat = j > 0 and "upsample" in arch[start_i + j - 1]
        if concat:
            in_dim += skip_dims[layer]
        decoder.append((block, in_dim, out_dim, r, layer, concat))
        in_dim = out_dim
        if "upsample" in block:
            layer -= 1
            r *= 0.5
            out_dim = out_dim // 2
    return encoder, decoder, skip_dims


def _influence_keys(plans):
    """(kind, layer) -> radius for every rigid-influence consumer in the
    architecture plans (every simple/resnetb block, strided = 'pool').

    ALL keys are cached, including single-consumer ones (each 'pool' key
    has exactly one strided consumer at the default architecture): a
    consumer-count ≥ 2 gating was built and A/B'd end-to-end on the TPU
    and LOSES 17.6% (813.3k vs 987.7k pts/s) — the standalone prebuilt
    build computes influence far cheaper than the consumer block can
    inline (inline it lands on the gather→dot relayout boundary,
    RESULTS.md kernel findings), so the materialization round trip pays
    for itself even with one consumer."""
    needed = {}
    for plan in plans:
        for name, _i, _o, r, layer, _c in plan:
            if "simple" in name or "resnetb" in name:
                kind = "pool" if "strided" in name else "conv"
                needed[(kind, layer)] = r
    return needed


def influence_cache_bytes(cfg, needed, pyr: Pyramid) -> int:
    """Analytic HBM cost of the hoisted influence cache: one
    (B, Nq, K, M) tensor in ``cfg.compute_dtype`` per (kind, level) entry.
    ``needed`` maps (kind, layer) -> radius as built in
    :func:`build_influence_cache`. Shapes are static under trace, so this
    is a plain Python computation."""
    itemsize = jnp.dtype(cfg.compute_dtype).itemsize
    total = 0
    m = cfg.num_kernel_points
    for (kind, layer) in needed:
        if kind == "pool":
            q, inds = pyr.points[layer + 1], pyr.pools[layer]
        else:
            q, inds = pyr.points[layer], pyr.neighbors[layer]
        b, nq = q.shape[0], q.shape[1]
        k = inds.shape[-1]
        total += b * nq * k * m * itemsize
    return total


def build_influence_cache(cfg, plans, pyr: Pyramid):
    """Hoisted rigid KP influence weights, one per (conv|pool, level).

    Every conv block at a pyramid level shares its geometry — the same
    ``pyr.neighbors[l]`` (or ``pools[l]``), radius, extent and kernel point
    layout — so the (B, Nq, K, M) influence tensor the reference recomputes
    inside every KPConv forward (blocks.py:280-346) is computed ONCE here
    and reused by all of them (including deformable blocks' rigid offset
    convs). Stored in ``cfg.compute_dtype``, exactly the dtype the einsum
    consumes, so numerics are unchanged. ``plans`` is an iterable of plan
    lists (encoder(s) + decoder) from :func:`plan_architecture`.
    """
    from mvkpconv_tpu.models.kernel_points import kernel_point_positions

    needed = _influence_keys(plans)
    if influence_cache_bytes(cfg, needed, pyr) > (
        getattr(cfg, "influence_cache_budget_mb", 1024.0) * 2**20
    ):
        # Automatic HBM-pressure fallback: an empty cache makes every block
        # recompute its influence in place (blocks.py handles the missing
        # key), trading ~3% step time for the cache's residency.
        return {}
    cache = {}
    for (kind, layer), r in sorted(needed.items()):
        extent = r * cfg.kp_extent / cfg.conv_radius
        kp = jnp.asarray(kernel_point_positions(r, cfg.num_kernel_points))
        if kind == "pool":
            q, inds = pyr.points[layer + 1], pyr.pools[layer]
        else:
            q, inds = pyr.points[layer], pyr.neighbors[layer]
        all_w = B.rigid_influence(
            q, pyr.points[layer], inds, kp, extent,
            cfg.kp_influence, cfg.aggregation_mode,
        )
        cache[(kind, layer)] = all_w.astype(cfg.compute_dtype)
    return cache


def make_influence_cache(cfg, plans, pyr: Pyramid):
    """Influence-sharing policy for a model forward. Returns one of:

    * a prebuilt dict — ``cfg.influence_cache == 'prebuilt'`` (production
      default, the measured winner): :func:`build_influence_cache` hoists
      every level's rigid influence before the trunk. Round-4 TPU A/B vs
      'lazy': 987.7k vs 919.6k pts/s inference, 379.4k vs 344.1k train.
    * ``{}`` — ``'lazy'``: the first rigid conv block at each (kind, level)
      computes influence riding its own fused position⊕feature gather
      (`blocks.kpconv_apply(return_influence=True)`) and deposits it for
      the level's other blocks. Kept as the documented NEGATIVE result:
      the standalone cache build measures 12.2 ms in isolation
      (outputs/r4/phases.txt) but its marginal in-step cost is lower than
      the deposit path's — materializing ``all_w`` as an explicit f32
      output defeats XLA's fusion of the influence chain into the
      depositing block (the microbenchmark-honesty finding, RESULTS.md).
      Also forced to 'prebuilt' under ``cfg.remat == 'blocks'``: a lazy
      deposit from inside an ``nn.remat``-wrapped block would leak tracers
      across the checkpoint boundary.
    * ``None`` — caching disabled (``'none'`` or the analytic cache bytes
      exceed ``cfg.influence_cache_budget_mb``): every block recomputes
      influence in place and deposits nothing (identical numerics, no
      residency).
    """
    policy = getattr(cfg, "influence_cache", "prebuilt")
    if policy == "none":
        return None
    needed = _influence_keys(plans)
    if influence_cache_bytes(cfg, needed, pyr) > (
        getattr(cfg, "influence_cache_budget_mb", 1024.0) * 2**20
    ):
        return None
    if policy == "lazy" and getattr(cfg, "remat", "none") != "blocks":
        return {}
    return build_influence_cache(cfg, plans, pyr)


class KPFCNNEncoder(nn.Module):
    """Encoder half; returns bottleneck features + skip features."""

    cfg: Any
    plan: Tuple[tuple, ...]  # encoder plan entries

    @nn.compact
    def __call__(self, x, pyr: Pyramid, train: bool = False, infl=None):
        skips = []
        arch = list(self.cfg.architecture)
        for i, (name, in_dim, out_dim, r, layer, _) in enumerate(self.plan):
            # skip features are recorded just before each strided block
            # (architectures.py:328-331)
            if any(t in name for t in ("pool", "strided")):
                skips.append(x)
            block = B.block_decider(name, r, in_dim, out_dim, layer, self.cfg,
                                    name=f"block_{i}")
            if isinstance(block, (B.SimpleBlock, B.ResnetBottleneckBlock)):
                x = block(x, pyr, train, infl)
            else:
                x = block(x, pyr, train)
        return x, skips


class KPFCNNDecoder(nn.Module):
    """Decoder half with skip concatenation after each upsample."""

    cfg: Any
    plan: Tuple[tuple, ...]

    @nn.compact
    def __call__(self, x, skips, pyr: Pyramid, train: bool = False, infl=None):
        for i, (name, in_dim, out_dim, r, layer, concat) in enumerate(self.plan):
            if concat:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            block = B.block_decider(name, r, in_dim, out_dim, layer, self.cfg,
                                    name=f"block_{i}")
            if isinstance(block, B.UnaryBlock):
                x = block(x, pyr.masks[layer], train)
            elif isinstance(block, (B.SimpleBlock, B.ResnetBottleneckBlock)):
                x = block(x, pyr, train, infl)
            else:
                x = block(x, pyr, train)
        return x


class KPFCNNHead(nn.Module):
    """head_mlp + head_softmax (architectures.py:296-297,340-341)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        x = B.UnaryBlock(self.cfg.first_features_dim, use_bn=False, name="head_mlp")(
            x, mask, train
        )
        x = B.UnaryBlock(self.cfg.num_classes, use_bn=False, name="head_softmax")(
            x, mask, train
        )
        return x


class KPCNN(nn.Module):
    """KPConv classification network (architectures.py:57-186).

    Encoder from the block list (must end in 'global_average'), then a
    2-layer head. Unused by the segmentation pipelines but part of the
    reference model family.
    """

    cfg: Any

    @nn.compact
    def __call__(self, features, pyr: Pyramid, train: bool = False):
        enc, _, _ = plan_architecture(self.cfg)
        infl = make_influence_cache(self.cfg, (enc,), pyr)
        x = features
        for i, (name, in_dim, out_dim, r, layer, _) in enumerate(enc):
            if "global" in name:
                continue  # applied once below
            block = B.block_decider(name, r, in_dim, out_dim, layer, self.cfg,
                                    name=f"block_{i}")
            if isinstance(block, (B.SimpleBlock, B.ResnetBottleneckBlock)):
                x = block(x, pyr, train, infl)
            else:
                x = block(x, pyr, train)
        x = B.GlobalAverageBlock()(x, pyr, train)  # (B, C)
        x = B.UnaryBlock(1024, use_bn=False, name="head_mlp")(x, None, train)
        x = nn.Dense(self.cfg.num_classes, name="head_softmax")(x)
        return x


class KPFCNN(nn.Module):
    """3D-only KPConv segmentation baseline (train_ScanNet_baseline.py path).

    Call with level-0 features ``(B, N0, in_features_dim)`` and a ``Pyramid``;
    returns per-point logits ``(B, N0, num_classes)``.
    """

    cfg: Any

    def setup(self):
        enc, dec, _ = plan_architecture(self.cfg)
        self._plans = (tuple(enc), tuple(dec))
        self.encoder = KPFCNNEncoder(self.cfg, tuple(enc), name="encoder")
        self.decoder = KPFCNNDecoder(self.cfg, tuple(dec), name="decoder")
        self.head = KPFCNNHead(self.cfg, name="head")

    def __call__(self, features, pyr: Pyramid, train: bool = False):
        infl = make_influence_cache(self.cfg, self._plans, pyr)
        x, skips = self.encoder(features, pyr, train, infl=infl)
        x = self.decoder(x, skips, pyr, train, infl=infl)
        return self.head(x, pyr.masks[0], train)
