"""Join the round-4 deformable sweep results with their inspection stats
(offset magnitudes / in-extent fractions from tools/inspect_deform) into
one markdown table for RESULTS.md."""
import glob
import json
import os
import re
import sys

BASE = "/root/repo/outputs/r4"


def main():
    rows = []
    for d in sorted(glob.glob(f"{BASE}/deform_fp*_lr*")):
        m = re.match(r"deform_fp([\d.]+)_lr([\d.]+)$", os.path.basename(d))
        if not m:
            continue
        fp, lr = m.groups()
        try:
            res = json.load(open(f"{d}/results.json"))["kpconv_deformable"]
        except (OSError, KeyError, ValueError):
            continue
        stats_path = f"{d}/kpconv_deformable/inspect/deform_stats.json"
        mean_r = max_r = fit = None
        if os.path.exists(stats_path):
            layers = json.load(open(stats_path))["layers"]
            mean_r = sum(l["mean_kp_radius"] for l in layers) / len(layers)
            max_r = max(l["max_kp_radius"] for l in layers)
            fit = sum(l["fit_fraction"] for l in layers) / len(layers)
        rows.append((float(fp), float(lr), res, mean_r, max_r, fit))

    print("| fit power | offset LR× | val mIoU | final loss | mean KP r/extent | max | in-extent frac |")
    print("|---|---|---|---|---|---|---|")
    for fp, lr, res, mean_r, max_r, fit in rows:
        loss = res["final_loss"]
        loss_s = f"{loss:.2f}" if loss < 1e4 else f"{loss:.1e}"
        f = lambda v, n=2: ("—" if v is None else f"{v:.{n}f}")
        print(
            f"| {fp} | {lr} | {res['miou']:.3f} | {loss_s} | "
            f"{f(mean_r)} | {f(max_r)} | {f(fit, 3)} |"
        )

    long_p = f"{BASE}/deform_long/results.json"
    if os.path.exists(long_p):
        res = json.load(open(long_p))
        print("\nLong-budget A/B (1200 steps, fp0.5 lr0.1):")
        for k, v in res.items():
            print(f"  {k}: mIoU {v['miou']:.3f}  OA {v['oa']:.3f}")


if __name__ == "__main__":
    main()
