"""Summarize round-4 measurement outputs (outputs/r4/*) into markdown
tables ready to paste into RESULTS.md.

Usage: python scratch/harvest_r4.py [outputs/r4]

Handles whichever artifacts exist (the TPU queue and the CPU hedge write
the same shapes):
  bench_early.json / bench_final.json    — bench.py JSON lines
  remat_ab.txt                           — scratch/prof_remat2.py output
  variants_two_stage*/results.json       — measure_variants matrices
  deform_*/results.json                  — deformable sweep points
  bench_b{8,16}.txt                      — batch-size scaling probes
"""
import json
import os
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "outputs/r4"


def read(path):
    p = os.path.join(root, path)
    if os.path.exists(p):
        with open(p) as f:
            return f.read()
    return None


print(f"# Round-4 harvest from {root}\n")

for tag in ("bench_early", "bench_gform_dot", "bench_gform_vpu",
            "bench_combo", "bench_final"):
    raw = read(f"{tag}.json")
    if not raw or not raw.strip():
        print(f"* {tag}: MISSING")
        continue
    try:
        j = json.loads(raw.strip().splitlines()[-1])
        print(
            f"* {tag}: **{j['value']:,.0f} {j['unit']}** "
            f"(vs_baseline {j['vs_baseline']:.2f}x; "
            f"train {j.get('train_points_per_sec', 0):,.0f}; "
            f"mfu {j.get('mfu', float('nan')):.4f}; "
            f"host {j.get('host_points_per_sec', 0):,.0f}/"
            f"{j.get('host_train_points_per_sec', 0):,.0f})"
        )
    except (json.JSONDecodeError, KeyError) as e:
        print(f"* {tag}: unparseable ({e}): {raw.strip()[:120]}")

raw = read("remat_ab.txt")
if raw:
    print("\n## remat A/B (prof_remat2.py tail)\n```")
    print("\n".join(raw.strip().splitlines()[-8:]))
    print("```")

raw = read("gform.txt")
if raw:
    print("\n## g-form tail variants (prof_gform.py tail)\n```")
    print("\n".join(raw.strip().splitlines()[-30:]))
    print("```")

for bb in (8, 16):
    raw = read(f"bench_b{bb}.txt")
    if raw:
        tail = "\n".join(raw.strip().splitlines()[-2:])
        print(f"\n* B={bb} scaling: {tail}")

# ---- accuracy matrices -------------------------------------------------
def matrix_table(results):
    keys = sorted(results)
    print("\n| System | val mIoU | val OA |")
    print("|---|---|---|")
    for k in keys:
        r = results[k]
        if isinstance(r, dict) and "miou" in r:
            print(f"| {k} | {r['miou']:.3f} | {r.get('oa', float('nan')):.3f} |")


for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
    p = os.path.join(root, d, "results.json")
    if not os.path.exists(p):
        continue
    with open(p) as f:
        results = json.load(f)
    print(f"\n## {d}")
    matrix_table(results)

# ---- deform sweep rollup ----------------------------------------------
rows = []
for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
    m = re.match(r"deform(_cpu)?_fp([\d.]+)_lr([\d.]+)$", d)
    p = os.path.join(root, d, "results.json")
    if not m or not os.path.exists(p):
        continue
    with open(p) as f:
        results = json.load(f)
    for name, r in results.items():
        if isinstance(r, dict) and "miou" in r:
            rows.append((float(m.group(2)), float(m.group(3)), r["miou"], r.get("oa")))
if rows:
    print("\n## deformable sweep (fitting_power x offset-LR factor)\n")
    print("| fit power | LR factor | val mIoU | val OA |")
    print("|---|---|---|---|")
    for fp, lr, miou, oa in sorted(rows):
        print(f"| {fp} | {lr} | {miou:.3f} | {oa if oa is None else f'{oa:.3f}'} |")

# ---- deform inspection stats (tools/inspect_deform artifacts) -----------
for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
    p = os.path.join(root, d, "kpconv_deformable", "inspect",
                     "deform_stats.json")
    if not os.path.exists(p):
        continue
    with open(p) as f:
        stats = json.load(f)
    layers = stats.get("layers", stats if isinstance(stats, list) else [])
    print(f"\n### {d} inspection (per deformable layer)")
    for lay in layers:
        if isinstance(lay, dict):
            keys = ("name", "level", "extent", "mean_kp_radius",
                    "max_kp_radius", "fit_fraction")
            print("  " + "  ".join(
                f"{k}={lay[k]:.3f}" if isinstance(lay.get(k), float)
                else f"{k}={lay.get(k)}" for k in keys if k in lay))
