"""KPConv network blocks (Flax linen).

TPU-native re-design of KPConv-PyTorch/models/blocks.py. Differences from
the reference (deliberate, for XLA/TPU):
  * dense batched layout ``(B, N, C)`` instead of stacked ragged clouds;
  * masked batch statistics — padded slots are excluded from BatchNorm
    moments (the reference normalizes over all stacked points,
    blocks.py:453-462, and has no padding to worry about);
  * the KPConv op is expressed as two einsum contractions that XLA maps to
    the MXU (reference does gather + per-kernel-point matmuls,
    blocks.py:277-374); a fused Pallas kernel can swap in underneath
    ``kpconv_apply`` without touching the modules;
  * neighbor indices use the shadow convention (index == N ⇒ zero feature),
    identical to the reference's shadow points.

Block semantics (KPConv math, bottleneck structure, leaky-relu 0.1, max-pool
shortcut on strided blocks, closest-pool upsampling) match the reference
exactly so that ``architecture`` lists mean the same thing.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvkpconv_tpu.models.kernel_points import kernel_point_positions
from mvkpconv_tpu.ops.gather import group_points, pad_shadow_row


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, Ns, C) features at (B, Nq, K) indices with shadow → 0."""
    return group_points(pad_shadow_row(x), idx)


def max_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Max over neighbor features (blocks.py:94-109 ``max_pool``).

    Shadow slots contribute zeros, like the reference's zero shadow row.
    """
    return jnp.max(gather_neighbors(x, idx), axis=-2)


def closest_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pool features from the closest (first) neighbor (blocks.py:79-91)."""
    return gather_neighbors(x, idx[..., :1])[..., 0, :]


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a finite gradient at x == 0 (returns grad 0 there).

    The influence distance hits EXACTLY zero on padded pyramid rows: a
    shadow query's shadow neighbors sit at coordinate-difference (0,0,0),
    which coincides with the center kernel point, so sq == 0 and plain
    ``sqrt``'s VJP is inf — and ``0 cotangent × inf = NaN`` poisons the
    deformable offset gradients from step 1 (the reference's ragged
    stacking has no padded query rows, so it never sees this; our static
    TPU batching does). Value is identical to ``jnp.sqrt`` for x ≥ 1e-30
    and 0 below (real squared distances are ≫ 1e-30).

    The clamp must be a NORMAL float: ``where`` only zeroes the branch's
    cotangent, the branch VJP still evaluates, and a denormal clamp (e.g.
    1e-38) is flushed to zero by the hardware — sqrt'(0) = inf and
    ``0 × inf = NaN`` reappears.
    """
    return jnp.where(x > 1e-30, jnp.sqrt(jnp.maximum(x, 1e-30)), 0.0)


def rigid_influence(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    kernel_pts: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
) -> jnp.ndarray:
    """Rigid KP influence weights ``all_w`` (B, Nq, K, M), f32.

    Depends only on geometry — query/support points, neighbor indices,
    kernel point layout, extent — which every rigid conv block at a pyramid
    level shares (same ``pyr.neighbors[l]``/radius/kernel points). Computing
    it ONCE per (level, conv|pool) and feeding the result to
    :func:`kpconv_apply` via ``precomputed_influence`` removes the per-block
    geometry recomputation entirely (measured ~20% of an L0 rigid block).
    Shadow neighbors (index == Ns) land on a +1e6 support row, giving zero
    influence exactly like the reference's shadow points (blocks.py:277).
    """
    s_pad = jnp.concatenate([s_pts, jnp.full_like(s_pts[:, :1], 1e6)], axis=1)
    neighbors = group_points(s_pad, neighb_inds) - q_pts[:, :, None, :]
    # |n − y|² = |n|² − 2 n·y + |y|² with the cross term as a
    # (B·Nq·K, 3)@(3, M) matmul — avoids materializing the 5-D difference
    # tensor, whose tiny minor dims (M=15, 3) force lane-hostile layouts
    # (measured 19.5 → 14.9 ms for an L0 block on v5e). Geometry is always
    # f32/HIGHEST: negligible FLOPs, and bf16-rounded geometry gives
    # percent-level weight error near kernel points (round-2 advisor).
    cross = jax.lax.dot_general(
        neighbors,
        kernel_pts.T.astype(jnp.float32),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n2 = jnp.sum(neighbors * neighbors, axis=-1)
    y2 = jnp.sum(kernel_pts * kernel_pts, axis=-1).astype(jnp.float32)
    sq = jnp.maximum(n2[..., None] - 2.0 * cross + y2[None, None, None], 0.0)
    if influence == "constant":
        all_w = jnp.ones_like(sq)
    elif influence == "linear":
        all_w = jnp.maximum(1.0 - _safe_sqrt(sq) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        all_w = jnp.exp(-sq / (2.0 * sigma**2))
    else:
        raise ValueError(f"unknown KP influence {influence!r}")
    if aggregation == "closest":
        closest = jnp.argmin(sq, axis=-1)
        all_w = all_w * jax.nn.one_hot(closest, kernel_pts.shape[0], dtype=all_w.dtype)
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation mode {aggregation!r}")
    return all_w


def _kp_contract(infl: jnp.ndarray, nx: jnp.ndarray, tail: str) -> jnp.ndarray:
    """The KPConv K-contraction: (B,Nq,K,M) influence × (B,Nq,K,C) gathered
    features → (B,Nq,M,C), f32 accumulation.

    'vpu' writes it as a broadcast multiply + sum over K: XLA fuses the
    whole chain (gather consumer → product → reduce) on the VPU with no
    relayout copies, measured 2.0× faster than the 'einsum' batched dot at
    L0 bench shapes (8.3 vs 16.7 ms, outputs/r4/hoist_variants.txt — the
    batched dot is a 65k-batch of tiny (15×30)@(30×C) MXU ops whose minor
    dims force lane-hostile layouts). Same FLOPs, reassociation-level
    numeric difference only.
    """
    if tail == "vpu":
        return jnp.sum(
            infl[..., :, None] * nx[..., None, :], axis=2, dtype=jnp.float32
        )
    return jnp.einsum(
        "bqkm,bqkc->bqmc", infl, nx, preferred_element_type=jnp.float32
    )


def kpconv_apply(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    x: jnp.ndarray,
    kernel_pts: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    kp_offsets: Optional[jnp.ndarray] = None,
    kp_modulations: Optional[jnp.ndarray] = None,
    compute_dtype: Any = jnp.float32,
    return_deform_aux: bool = False,
    use_pallas: bool = False,
    precomputed_influence: Optional[jnp.ndarray] = None,
    tail: str = "einsum",
    return_influence: bool = False,
):
    """Kernel point convolution (blocks.py:237-374 forward, batched).

    Args:
      q_pts: (B, Nq, 3) query points.
      s_pts: (B, Ns, 3) support points (shadow-padded invalid slots are fine:
        their 1e6 coordinates give zero influence).
      neighb_inds: (B, Nq, K) int32, shadow = Ns.
      x: (B, Ns, Cin) support features.
      kernel_pts: (M, 3) kernel point positions (radius-scaled).
      weights: (M, Cin, Cout) convolution weights.
      kp_extent: influence distance of each kernel point.
      influence: 'constant' | 'linear' | 'gaussian'.
      aggregation: 'sum' | 'closest'.
      kp_offsets: optional (B, Nq, M, 3) deformable offsets added to the
        kernel point positions per query point.
      precomputed_influence: optional (B, Nq, K, M) rigid influence weights
        from :func:`rigid_influence` — shared by every rigid conv block at
        a pyramid level. When given, the geometry pipeline is skipped
        entirely (features-only gather + contraction); numerics are
        identical because the same function computes it either way.
      tail: contraction form on the precomputed-influence fast path:
        'vpu' (the round-4 production default: the K-contraction as a
        broadcast multiply + sum-over-K on the VPU — XLA fuses it into
        the gather consumer without the relayout copies the batched dot
        needs; measured 8.3 vs 16.7 ms at L0 bench shapes,
        outputs/r4/hoist_variants.txt) | 'einsum' (gather features →
        'bqkm,bqkc->bqmc' batched dot → (M·Cin,Cout) matmul) |
        'gform_dot' | 'gform_vpu' (g-form: fold the weights into
        SUPPORT features before the gather — g = x @ W, one clean MXU
        matmul over Ns — then contract the gathered (B,Nq,K,M·Cout)
        with influence over K·M; measured 0.28×/0.20× end-to-end — the
        M·Cout gather payload is far past the ~512 B/row free-payload
        knee — kept config-gated as the negative result). All tails are
        identical numerics up to reassociation (scratch/prof_gform.py,
        scratch/prof_hoist2.py, tests/test_models.py).
      return_influence: rigid path only — additionally return the (B, Nq,
        K, M) influence weights this call computed (f32, pre-modulation,
        exactly :func:`rigid_influence`'s output). This is how the LAZY
        influence cache is filled: the first conv block at a pyramid level
        computes influence riding its own fused position⊕feature gather
        (payload width is free below the ~512 B/row knee) and deposits it
        for the level's other blocks, instead of a standalone cache build
        paying its own position gathers (~3.8M gather starts ≈ 12 ms/step
        at bench shapes, outputs/r4/phases.txt).

    Returns:
      (B, Nq, Cout); with ``return_influence``, ``(out, all_w)``.
    """
    if return_influence and (
        precomputed_influence is not None
        or kp_offsets is not None
        or return_deform_aux
    ):
        raise ValueError(
            "return_influence requires the self-contained rigid path"
        )
    if (
        precomputed_influence is not None
        and kp_offsets is None
        and not return_deform_aux
    ):
        m, cin, cout = weights.shape
        infl = precomputed_influence.astype(compute_dtype)
        if tail in ("gform_dot", "gform_vpu"):
            if kp_modulations is not None:
                # wf·mod[q,m] ≡ infl·mod[q,m] — fold into influence so the
                # g-form stays a pure feature path
                infl = infl * kp_modulations[:, :, None, :].astype(infl.dtype)
            g = jax.lax.dot_general(
                x.astype(compute_dtype),
                weights.transpose(1, 0, 2).reshape(cin, m * cout).astype(
                    compute_dtype
                ),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype)
            gk = group_points(pad_shadow_row(g), neighb_inds)
            b, nq, k = neighb_inds.shape
            if tail == "gform_dot":
                out = jax.lax.dot_general(
                    infl.reshape(b, nq, k * m),
                    gk.reshape(b, nq, k * m, cout),
                    dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32,
                )
            else:
                out = jnp.sum(
                    infl[..., None] * gk.reshape(b, nq, k, m, cout),
                    axis=(2, 3),
                    dtype=jnp.float32,
                )
            return out.astype(jnp.float32)
        if tail not in ("einsum", "vpu"):
            raise ValueError(f"unknown kpconv tail {tail!r}")
        nx = group_points(pad_shadow_row(x), neighb_inds)  # (B, Nq, K, Cin)
        wf = _kp_contract(infl, nx.astype(compute_dtype), tail)
        if kp_modulations is not None:
            wf = wf * kp_modulations[..., :, None].astype(wf.dtype)
        out = jax.lax.dot_general(
            wf.reshape(wf.shape[0], wf.shape[1], m * cin).astype(compute_dtype),
            weights.reshape(m * cin, cout).astype(compute_dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.float32)

    s_pad = jnp.concatenate(
        [s_pts, jnp.full_like(s_pts[:, :1], 1e6)], axis=1
    )  # shadow support point at +1e6 (blocks.py:277)
    # ONE gather for positions ⊕ features: TPU gathers are start-bound and
    # payload-size-insensitive, so fusing the two halves the gather cost
    payload = jnp.concatenate(
        [s_pad, pad_shadow_row(x.astype(s_pts.dtype))], axis=-1
    )
    gathered = group_points(payload, neighb_inds)
    neighbors = gathered[..., :3] - q_pts[:, :, None, :]
    nx_gathered = gathered[..., 3:]

    # Fast path: fused Pallas kernel for the rigid linear/sum configuration
    # (the production setting) — influence weights and per-KP weighted sums
    # never leave VMEM. Falls back to the XLA path for deformable/closest/
    # gaussian variants and non-TPU backends.
    if (
        use_pallas
        and not return_influence  # the fused kernel never materializes all_w
        and kp_offsets is None
        and kp_modulations is None
        and not return_deform_aux
        and influence == "linear"
        and aggregation == "sum"
        and q_pts.shape[1] % min(128, q_pts.shape[1]) == 0
    ):
        from mvkpconv_tpu.ops.pallas.kpconv import kpconv_fused, pallas_supported

        if pallas_supported():
            nx = nx_gathered
            m, cin, cout = weights.shape
            return kpconv_fused(
                neighbors,
                nx.astype(compute_dtype),
                kernel_pts.astype(jnp.float32),
                weights.reshape(m * cin, cout).astype(jnp.float32),
                float(kp_extent),
            )
    # (B, Nq, K, M) squared distances between neighbors and kernel points.
    # Rigid path: |n − y|² = |n|² − 2 n·y + |y|² with the cross term as a
    # (B·Nq·K, 3)@(3, M) matmul — avoids materializing the 5-D difference
    # tensor, whose tiny minor dims (M=15, 3) force lane-hostile layouts and
    # relayout copies around the einsum below (measured 19.5 → 14.9 ms for
    # an L0 block on v5e). Deformable keeps the explicit difference (kernel
    # points vary per query there, so there is no shared (3, M) operand).
    if kp_offsets is not None:
        kp = kernel_pts[None, None, None].astype(jnp.float32) + kp_offsets[:, :, None]
        diff = neighbors[..., None, :] - kp
        sq = jnp.sum(diff * diff, axis=-1)
    else:
        kp = kernel_pts[None, None, None].astype(jnp.float32)
        # The geometry matmul is always f32/HIGHEST: its FLOPs are negligible
        # next to the feature matmuls, and computing KP influence distances
        # from bf16-rounded geometry gives percent-level weight error near
        # kernel points (round-2 advisor finding).
        cross = jax.lax.dot_general(
            neighbors.astype(jnp.float32),
            kernel_pts.T.astype(jnp.float32),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        n2 = jnp.sum(neighbors * neighbors, axis=-1)
        y2 = jnp.sum(kernel_pts * kernel_pts, axis=-1).astype(jnp.float32)
        sq = jnp.maximum(
            n2[..., None] - 2.0 * cross + y2[None, None, None], 0.0
        )
    deform_aux = None
    if return_deform_aux:
        # min distance of each (deformed) kernel point to a REAL neighbor,
        # for the fitting regularizer (blocks.py:300-305); all-shadow rows
        # contribute zero.
        valid = (neighb_inds < s_pts.shape[1])[..., None]  # (B, Nq, K, 1)
        sq_valid = jnp.where(valid, sq, jnp.inf)
        min_d2 = jnp.min(sq_valid, axis=-2)  # (B, Nq, M)
        min_d2 = jnp.where(jnp.isfinite(min_d2), min_d2, 0.0)
        kp_abs = jnp.broadcast_to(
            kp[..., 0, :, :], sq.shape[:2] + tuple(kernel_pts.shape)
        )  # (B, Nq, M, 3) absolute (deformed) kernel positions
        deform_aux = (min_d2, kp_abs)

    if influence == "constant":
        all_w = jnp.ones_like(sq)
    elif influence == "linear":
        all_w = jnp.maximum(1.0 - _safe_sqrt(sq) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        all_w = jnp.exp(-sq / (2.0 * sigma**2))
    else:
        raise ValueError(f"unknown KP influence {influence!r}")

    if aggregation == "closest":
        closest = jnp.argmin(sq, axis=-1)
        all_w = all_w * jax.nn.one_hot(closest, kernel_pts.shape[0], dtype=all_w.dtype)
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation mode {aggregation!r}")

    nx = nx_gathered  # (B, Nq, K, Cin), shadow → 0
    # weighted features per kernel point, then the big matmul; the
    # contraction form follows `tail` here too (deformable / non-cached
    # rigid blocks) — g-form tails only exist on the fast path, so any
    # other value falls back to the einsum batched dot.
    wf = _kp_contract(
        all_w.astype(compute_dtype),
        nx.astype(compute_dtype),
        "vpu" if tail == "vpu" else "einsum",
    )
    if kp_modulations is not None:
        # modulated deformable KPConv (blocks.py:367-369):
        # weighted_features *= modulations per kernel point
        wf = wf * kp_modulations[..., :, None].astype(wf.dtype)
    m, cin, cout = weights.shape
    out = jax.lax.dot_general(
        wf.reshape(wf.shape[0], wf.shape[1], m * cin).astype(compute_dtype),
        weights.reshape(m * cin, cout).astype(compute_dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out.astype(jnp.float32)
    if return_deform_aux:
        return out, deform_aux
    if return_influence:
        return out, all_w
    return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid points only (cf. BatchNormBlock, blocks.py:430-462).

    The reference normalizes over all stacked points with momentum 0.02
    (torch convention: running ← 0.98·running + 0.02·batch). Padded slots
    must not pollute moments here, hence the mask.
    """

    use_bn: bool = True
    momentum: float = 0.02  # torch-style update fraction
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c = x.shape[-1]
        if not self.use_bn:
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return x + bias
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if train:
            if mask is None:
                mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
                var = jnp.var(x, axis=tuple(range(x.ndim - 1)))
            else:
                m = mask.astype(x.dtype)[..., None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / count
                centered = (x - mean) * m
                var = jnp.sum(centered**2, axis=tuple(range(x.ndim - 1))) / count
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y


class UnaryBlock(nn.Module):
    """1×1 MLP + BN + LeakyReLU(0.1) (blocks.py:470-504)."""

    out_dim: int
    use_bn: bool = True
    bn_momentum: float = 0.02
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = nn.Dense(self.out_dim, use_bias=False, name="mlp")(x)
        x = MaskedBatchNorm(self.use_bn, self.bn_momentum, name="bn")(x, mask, train)
        if not self.no_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class KPConvLayer(nn.Module):
    """The learned KPConv op: kernel points + (M, Cin, Cout) weights.

    ``radius`` fixes the kernel point layout scale: points span
    ``radius · KP_extent / conv_radius`` like load_kernels(extent) in
    blocks.py:143-235. Deformable variant predicts per-point kernel offsets
    with a rigid offset KPConv (blocks.py:237-270).
    """

    in_dim: int
    out_dim: int
    radius: float
    kp_extent: float
    num_kernel_points: int = 15
    influence: str = "linear"
    aggregation: str = "sum"
    deformable: bool = False
    modulated: bool = False  # deformable + per-KP sigmoid modulations
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    tail: str = "einsum"  # precomputed-influence contraction form

    def setup(self):
        # kernel points scale with the conv radius (blocks.py:225-235: the
        # unit disposition — shell at 0.66 — times `radius`); kp_extent only
        # sets the influence width.
        kp = kernel_point_positions(self.radius, self.num_kernel_points)
        self.kernel_pts = jnp.asarray(kp)
        std = np.sqrt(2.0 / (self.in_dim * self.num_kernel_points))
        self.weights = self.param(
            "weights",
            nn.initializers.normal(stddev=std),
            (self.num_kernel_points, self.in_dim, self.out_dim),
        )
        if self.deformable:
            # offset dim: 3 per KP, +1 per KP for modulations
            # (blocks.py:188-192: offset_dim = (p_dim + 1)·K if modulated)
            per_kp = 4 if self.modulated else 3
            self.offset_conv = KPConvLayer(
                in_dim=self.in_dim,
                out_dim=self.num_kernel_points * per_kp,
                radius=self.radius,
                kp_extent=self.kp_extent,
                num_kernel_points=self.num_kernel_points,
                influence=self.influence,
                aggregation=self.aggregation,
                deformable=False,
                compute_dtype=self.compute_dtype,
                tail=self.tail,
                name="offset_conv",
            )
            self.offset_bias = self.param(
                "offset_bias", nn.initializers.zeros,
                (self.num_kernel_points * per_kp,),
            )

    def __call__(
        self, q_pts, s_pts, neighb_inds, x, *, q_mask=None,
        precomputed_influence=None, return_influence=False,
    ):
        offsets = None
        modulations = None
        lazy_w = None
        m = self.num_kernel_points
        if self.deformable:
            # the offset-predicting conv is rigid and shares the level's
            # geometry, so it consumes the level's influence cache even
            # though the deformed main conv cannot — and under the lazy
            # cache policy it is the one that DEPOSITS the level's rigid
            # influence when this block runs first
            if return_influence and precomputed_influence is None:
                off_feat, lazy_w = self.offset_conv(
                    q_pts, s_pts, neighb_inds, x, return_influence=True
                )
            else:
                off_feat = self.offset_conv(
                    q_pts, s_pts, neighb_inds, x,
                    precomputed_influence=precomputed_influence,
                )
            off_feat = off_feat + self.offset_bias
            b, nq = off_feat.shape[:2]
            if self.modulated:
                # first 3K features are offsets, last K are modulations
                # (blocks.py:249-256): modulation = 2·sigmoid(·)
                offsets = off_feat[..., : m * 3].reshape(b, nq, m, 3) * self.kp_extent
                modulations = 2.0 * jax.nn.sigmoid(off_feat[..., m * 3 :])
            else:
                offsets = off_feat.reshape(b, nq, m, 3) * self.kp_extent
        out = kpconv_apply(
            q_pts,
            s_pts,
            neighb_inds,
            x,
            self.kernel_pts,
            self.weights,
            self.kp_extent,
            self.influence,
            self.aggregation,
            kp_offsets=offsets,
            kp_modulations=modulations,
            compute_dtype=self.compute_dtype,
            return_deform_aux=self.deformable,
            use_pallas=self.use_pallas,
            precomputed_influence=(
                None if self.deformable else precomputed_influence
            ),
            tail=self.tail,
            return_influence=(
                return_influence
                and not self.deformable
                and precomputed_influence is None
            ),
        )
        if not self.deformable and return_influence and (
            precomputed_influence is None
        ):
            out, lazy_w = out
        if self.deformable:
            out, (min_d2, deformed_kp) = out
            # consumed by losses.p2p_fitting_regularizer via the
            # 'intermediates' collection (reference saves m.min_d2 /
            # m.deformed_KP on the module, blocks.py:300-305)
            self.sow("intermediates", "deform_min_d2", min_d2 / (self.kp_extent**2))
            self.sow(
                "intermediates", "deform_kp_locs", deformed_kp / self.kp_extent
            )
            if q_mask is not None:
                # so the p2p regularizer can exclude padded query rows from
                # its normalization (the reference means over real stacked
                # points only, architectures.py:21-54)
                self.sow("intermediates", "deform_mask", q_mask)
        return (out, lazy_w) if return_influence else out


def _resolve_tail(tail: str, train: bool) -> str:
    """Resolve kpconv_tail='auto' per mode: the VPU mul-reduce contraction
    is 7% faster END-TO-END for the training step (379k vs 354k pts/s —
    its backward avoids the batched dot's transposed-operand relayouts)
    but 3% slower for inference (958k vs 988k), both measured at bench
    shapes on v5e (outputs/r4/). 'auto' therefore picks 'vpu' when
    train=True and 'einsum' otherwise; numerics differ only at
    reassociation level (tests/test_models.py::test_gform_tail_matches_einsum).
    """
    if tail == "auto":
        return "vpu" if train else "einsum"
    return tail


class SimpleBlock(nn.Module):
    """KPConv → BN → LeakyReLU, output out_dim//2 (blocks.py:507-561)."""

    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: Any  # KPConfig-like

    @nn.compact
    def __call__(self, x, pyr, train: bool = False, infl=None):
        extent = self.radius * self.cfg.kp_extent / self.cfg.conv_radius
        strided = "strided" in self.block_name
        l = self.layer_ind
        q = pyr.points[l + 1] if strided else pyr.points[l]
        inds = pyr.pools[l] if strided else pyr.neighbors[l]
        out_mask = pyr.masks[l + 1] if strided else pyr.masks[l]
        key = ("pool" if strided else "conv", l)
        pi = infl.get(key) if infl is not None else None
        conv = KPConvLayer(
            in_dim=self.in_dim,
            out_dim=self.out_dim // 2,
            radius=self.radius,
            kp_extent=extent,
            num_kernel_points=self.cfg.num_kernel_points,
            influence=self.cfg.kp_influence,
            aggregation=self.cfg.aggregation_mode,
            deformable="deform" in self.block_name,
            modulated=getattr(self.cfg, "modulated", False),
            compute_dtype=self.cfg.compute_dtype,
            use_pallas=getattr(self.cfg, "use_pallas_kpconv", False),
            tail=_resolve_tail(getattr(self.cfg, "kpconv_tail", "einsum"), train),
            name="KPConv",
        )
        if infl is not None and pi is None:
            # lazy influence cache: this block runs the level first, so it
            # computes the level's rigid influence riding its own fused
            # position⊕feature gather and deposits it (in compute_dtype,
            # exactly what build_influence_cache would store) for the
            # level's other rigid blocks
            x, w = conv(q, pyr.points[l], inds, x, q_mask=out_mask,
                        return_influence=True)
            infl[key] = w.astype(self.cfg.compute_dtype)
        else:
            x = conv(q, pyr.points[l], inds, x, q_mask=out_mask,
                     precomputed_influence=pi)
        x = MaskedBatchNorm(self.cfg.use_batch_norm, self.cfg.batch_norm_momentum, name="bn")(
            x, out_mask, train
        )
        return nn.leaky_relu(x, 0.1)


class ResnetBottleneckBlock(nn.Module):
    """unary↓4 → KPConv → unary↑ (+ pooled shortcut) (blocks.py:564-649)."""

    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: Any

    @nn.compact
    def __call__(self, x, pyr, train: bool = False, infl=None):
        extent = self.radius * self.cfg.kp_extent / self.cfg.conv_radius
        strided = "strided" in self.block_name
        l = self.layer_ind
        q = pyr.points[l + 1] if strided else pyr.points[l]
        inds = pyr.pools[l] if strided else pyr.neighbors[l]
        out_mask = pyr.masks[l + 1] if strided else pyr.masks[l]
        key = ("pool" if strided else "conv", l)
        pi = infl.get(key) if infl is not None else None
        mid = self.out_dim // 4

        h = x
        if self.in_dim != mid:
            h = UnaryBlock(
                mid, self.cfg.use_batch_norm, self.cfg.batch_norm_momentum, name="unary1"
            )(h, pyr.masks[l], train)
        conv = KPConvLayer(
            in_dim=mid,
            out_dim=mid,
            radius=self.radius,
            kp_extent=extent,
            num_kernel_points=self.cfg.num_kernel_points,
            influence=self.cfg.kp_influence,
            aggregation=self.cfg.aggregation_mode,
            deformable="deform" in self.block_name,
            modulated=getattr(self.cfg, "modulated", False),
            compute_dtype=self.cfg.compute_dtype,
            use_pallas=getattr(self.cfg, "use_pallas_kpconv", False),
            tail=_resolve_tail(getattr(self.cfg, "kpconv_tail", "einsum"), train),
            name="KPConv",
        )
        if infl is not None and pi is None:
            # lazy influence cache deposit — see SimpleBlock
            h, w = conv(q, pyr.points[l], inds, h, q_mask=out_mask,
                        return_influence=True)
            infl[key] = w.astype(self.cfg.compute_dtype)
        else:
            h = conv(q, pyr.points[l], inds, h, q_mask=out_mask,
                     precomputed_influence=pi)
        h = MaskedBatchNorm(
            self.cfg.use_batch_norm, self.cfg.batch_norm_momentum, name="bn_conv"
        )(h, out_mask, train)
        h = nn.leaky_relu(h, 0.1)
        h = UnaryBlock(
            self.out_dim,
            self.cfg.use_batch_norm,
            self.cfg.batch_norm_momentum,
            no_relu=True,
            name="unary2",
        )(h, out_mask, train)

        shortcut = max_pool(x, inds) if strided else x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(
                self.out_dim,
                self.cfg.use_batch_norm,
                self.cfg.batch_norm_momentum,
                no_relu=True,
                name="unary_shortcut",
            )(shortcut, out_mask, train)
        return nn.leaky_relu(h + shortcut, 0.1)


class NearestUpsampleBlock(nn.Module):
    """Copy features from the closest coarser point (blocks.py:665-680)."""

    layer_ind: int  # level being upsampled TO is layer_ind - 1

    def __call__(self, x, pyr, train: bool = False):
        return closest_pool(x, pyr.upsamples[self.layer_ind - 1])


class MaxPoolBlock(nn.Module):
    layer_ind: int

    def __call__(self, x, pyr, train: bool = False):
        return max_pool(x, pyr.pools[self.layer_ind + 1])


class GlobalAverageBlock(nn.Module):
    """Masked mean over the coarsest level (blocks.py:652-662)."""

    def __call__(self, x, pyr, train: bool = False):
        m = pyr.masks[-1].astype(x.dtype)[..., None]
        return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def _maybe_remat(cls, block_name: str, cfg):
    """Per-block rematerialization (cfg.remat == 'blocks'): recompute the
    block's internals — the gathered (B, Nq, K, C) neighbor features and the
    influence einsum — in the backward pass instead of saving them. Those
    residuals are the training step's dominant HBM footprint (~hundreds of
    MB per L0 block at bench shapes). Deformable blocks are left alone:
    they sow 'intermediates' consumed by the fitting regularizer.
    ``train`` (arg 3, with self at 0) is static."""
    if getattr(cfg, "remat", "none") == "blocks" and "deform" not in block_name:
        return nn.remat(cls, static_argnums=(3,))
    return cls


def block_decider(
    block_name: str, radius: float, in_dim: int, out_dim: int, layer_ind: int,
    cfg, name: Optional[str] = None,
) -> nn.Module:
    """Instantiate a block by architecture-list name (blocks.py:387-427).

    ``name`` pins the module name so the parameter tree is independent of
    wrapper classes (nn.remat renames auto-named modules, which would make
    checkpoints remat-dependent)."""
    if block_name == "unary":
        return UnaryBlock(out_dim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                          name=name)
    if block_name in ("simple", "simple_deformable", "simple_strided",
                      "simple_deformable_strided"):
        cls = _maybe_remat(SimpleBlock, block_name, cfg)
        return cls(block_name, in_dim, out_dim, radius, layer_ind, cfg,
                   name=name)
    if block_name in ("resnetb", "resnetb_deformable", "resnetb_strided",
                      "resnetb_deformable_strided"):
        cls = _maybe_remat(ResnetBottleneckBlock, block_name, cfg)
        return cls(block_name, in_dim, out_dim, radius, layer_ind, cfg,
                   name=name)
    if block_name == "nearest_upsample":
        return NearestUpsampleBlock(layer_ind, name=name)
    if block_name == "max_pool" or block_name == "max_pool_wide":
        return MaxPoolBlock(layer_ind, name=name)
    if block_name == "global_average":
        return GlobalAverageBlock(name=name)
    raise ValueError(f"unknown block name in architecture: {block_name!r}")
