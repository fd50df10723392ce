"""Deformable-kernel inspection artifacts.

Offline, headless equivalent of the reference's mayavi deformed-kernel
inspector (KPConv-PyTorch/utils/visualizer.py:1-531 ``ModelVisualizer``,
utils/mayavi_visu.py:1-291): the sown ``deform_kp_locs`` / ``deform_min_d2``
intermediates (models/blocks.py KPConvLayer) are collected from a forward
pass, denormalized back to world space, and dumped as per-layer PLYs that
any point cloud viewer can open — the query-level cloud plus, for a strided
subset of query points, the M deformed kernel positions, colored by kernel
point and carrying the fitting distance as a scalar field.

This is the debugging surface for *why* a deformable run behaves as it does:
offset magnitudes, in-extent fractions, and per-layer PLYs make collapsed or
runaway offsets visible (the reference exposes the same signals
interactively, visualizer.py:270-430).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from mvkpconv_tpu.utils.ply import write_ply

# distinct colors per kernel point (cycled when M > len)
_KP_PALETTE = np.asarray(
    [
        (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
        (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
        (210, 245, 60), (250, 190, 212), (0, 128, 128), (220, 190, 255),
        (170, 110, 40), (255, 250, 200), (128, 0, 0),
    ],
    np.uint8,
)


def deformable_plan_entries(cfg) -> List[tuple]:
    """(block_name, radius, layer_ind) for each deformable conv block, in
    execution order (= sow order of the 'intermediates' collection)."""
    from mvkpconv_tpu.models.kpfcnn import plan_architecture

    enc, dec, _ = plan_architecture(cfg)
    return [
        (name, r, layer)
        for (name, _i, _o, r, layer, _c) in list(enc) + list(dec)
        if "deform" in name
    ]


def collect_deform_layers(intermediates, cfg, pyr) -> List[Dict]:
    """Pair sown deform intermediates with plan geometry.

    Returns one dict per deformable conv layer:
      name, level, extent (world units), q_pts (B, Nq, 3), q_mask (B, Nq),
      kp_world (B, Nq, M, 3) absolute deformed kernel positions,
      min_d2_norm (B, Nq, M) fitting distances / extent².

    Flax sows in execution order and flatten_dict preserves insertion
    order, so the n-th 'deform_kp_locs' entry belongs to the n-th
    deformable block of the plan.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(intermediates), sep="/"
    )
    entries = deformable_plan_entries(cfg)
    out = []
    i = 0
    for key, value in flat.items():
        if not key.endswith("deform_kp_locs"):
            continue
        locs = value[0] if isinstance(value, tuple) else value
        d2 = flat[key.replace("deform_kp_locs", "deform_min_d2")]
        d2 = d2[0] if isinstance(d2, tuple) else d2
        name, radius, layer = entries[i]
        i += 1
        extent = radius * cfg.kp_extent / cfg.conv_radius
        q_level = layer + 1 if "strided" in name else layer
        q_pts = np.asarray(pyr.points[q_level])
        q_mask = np.asarray(pyr.masks[q_level])
        kp_world = q_pts[:, :, None, :] + np.asarray(locs, np.float32) * extent
        out.append(
            dict(
                name=f"{key.rsplit('/', 2)[0]}[{name}]",
                level=q_level,
                extent=float(extent),
                q_pts=q_pts,
                q_mask=q_mask,
                kp_world=kp_world.astype(np.float32),
                min_d2_norm=np.asarray(d2, np.float32),
            )
        )
    if i != len(entries):
        raise ValueError(
            f"found {i} sown deformable layers but the plan has "
            f"{len(entries)} — was the forward run with "
            "mutable=['intermediates']?"
        )
    return out


def deform_stats(layers: List[Dict]) -> List[Dict]:
    """Per-layer health numbers (the quantities one reads off the
    reference's interactive view): mean/max offset magnitude in units of
    the extent, and the fraction of deformed kernel points within extent
    of a real neighbor (min_d2_norm < 1)."""
    stats = []
    for lay in layers:
        m = lay["q_mask"]
        rel = (lay["kp_world"] - lay["q_pts"][:, :, None, :]) / lay["extent"]
        # offset = deformed position − rigid disposition; rigid dispositions
        # have |rel| ≤ ~1, so use distance from the *rigid* layout when
        # available; here report |rel| directly plus the fit fraction.
        mag = np.linalg.norm(rel, axis=-1)[m]
        fit = (lay["min_d2_norm"] < 1.0)[m]
        stats.append(
            dict(
                name=lay["name"],
                level=lay["level"],
                extent=lay["extent"],
                mean_kp_radius=float(mag.mean()) if mag.size else 0.0,
                max_kp_radius=float(mag.max()) if mag.size else 0.0,
                fit_fraction=float(fit.mean()) if fit.size else 0.0,
            )
        )
    return stats


def dump_deform_plys(
    out_dir,
    layers: List[Dict],
    batch_index: int = 0,
    max_queries: int = 128,
) -> List[Path]:
    """Write one PLY per deformable layer.

    Rows: the query-level cloud (kind=0, gray) ⊕ the M deformed kernel
    points of up to ``max_queries`` valid queries (kind=1, colored by
    kernel point id). Fields: x y z red green blue kind query_id kp_id
    min_d2 — min_d2 is the normalized fitting distance, so thresholding
    at 1.0 in a viewer separates "attached to geometry" from "lost"
    kernel points.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for li, lay in enumerate(layers):
        b = batch_index
        pts = lay["q_pts"][b]
        mask = lay["q_mask"][b]
        valid = np.nonzero(mask)[0]
        sel = valid[:: max(1, len(valid) // max_queries)][:max_queries]
        m = lay["kp_world"].shape[2]

        cloud_xyz = pts[mask]
        cloud_rgb = np.full((len(cloud_xyz), 3), 160, np.uint8)
        kp_xyz = lay["kp_world"][b, sel].reshape(-1, 3)
        kp_rgb = np.tile(_KP_PALETTE[np.arange(m) % len(_KP_PALETTE)], (len(sel), 1))
        kp_d2 = lay["min_d2_norm"][b, sel].reshape(-1)

        xyz = np.concatenate([cloud_xyz, kp_xyz]).astype(np.float32)
        rgb = np.concatenate([cloud_rgb, kp_rgb])
        kind = np.concatenate(
            [np.zeros(len(cloud_xyz), np.uint8), np.ones(len(kp_xyz), np.uint8)]
        )
        qid = np.concatenate(
            [np.full(len(cloud_xyz), -1, np.int32),
             np.repeat(sel.astype(np.int32), m)]
        )
        kpid = np.concatenate(
            [np.full(len(cloud_xyz), -1, np.int32),
             np.tile(np.arange(m, dtype=np.int32), len(sel))]
        )
        d2 = np.concatenate(
            [np.zeros(len(cloud_xyz), np.float32), kp_d2.astype(np.float32)]
        )
        path = out_dir / f"deform_layer{li}_L{lay['level']}.ply"
        write_ply(
            path,
            [xyz, rgb, kind, qid, kpid, d2],
            ["x", "y", "z", "red", "green", "blue", "kind", "query_id",
             "kp_id", "min_d2"],
        )
        paths.append(path)

        # Interactive twin of the mayavi kernel stepper
        # (KPConv-PyTorch/utils/visualizer.py:270-430): standalone HTML,
        # scene cloud + deformed-KP overlay, lost KPs (min_d2 > 1) toggled
        # separately so divergence is visible at a glance.
        from mvkpconv_tpu.utils.html_viewer import save_html_viewer

        lost = kp_d2 > 1.0
        save_html_viewer(
            out_dir / f"deform_layer{li}_L{lay['level']}.html",
            [
                {"name": "level cloud", "points": cloud_xyz,
                 "colors": cloud_rgb},
                {"name": "deformed kernel points",
                 "points": kp_xyz[~lost], "colors": kp_rgb[~lost],
                 "size": 2.0},
                {"name": "lost kernel points (min_d2 > 1)",
                 "points": kp_xyz[lost], "colors": kp_rgb[lost],
                 "size": 2.0},
            ],
            title=f"deformable layer {li} (level {lay['level']})",
        )
    return paths


def inspect_deformable(
    model, variables, batch, cfg, out_dir, batch_index: int = 0
) -> Dict:
    """Forward once with intermediates, dump PLYs + stats JSON; returns the
    stats dict. ``batch`` is the standard device batch; 3D-only (KPFCNN)
    and fusion (MVKPConv) models both work."""
    import jax.numpy as jnp

    from mvkpconv_tpu.models import KPFCNN
    from mvkpconv_tpu.ops.pyramid import build_pyramid

    pyr = build_pyramid(
        jnp.asarray(batch["points"]), jnp.asarray(batch["mask"]),
        cfg.pyramid_spec(),
    )
    if isinstance(model, KPFCNN):
        _, state = model.apply(
            variables, jnp.asarray(batch["features"]), pyr, train=False,
            mutable=["intermediates"],
        )
    else:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, state = model.apply(
            variables, jb, pyr, train=False, mutable=["intermediates"]
        )
    layers = collect_deform_layers(state["intermediates"], cfg, pyr)
    stats = deform_stats(layers)
    paths = dump_deform_plys(out_dir, layers, batch_index=batch_index)
    summary = {
        "layers": stats,
        "plys": [str(p) for p in paths],
    }
    out = Path(out_dir) / "deform_stats.json"
    out.write_text(json.dumps(summary, indent=2))
    return summary
