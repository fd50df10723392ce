#!/bin/bash
# Round-4 session-6 TPU queue. Fires after the accuracy queue's final bench
# ("queue done" sentinel in outputs/r4/accuracy.log). In decision-value order:
#   1. fresh top-level phase decomposition (locate the last ~1.2% to 10x)
#   2. serving-artifact parity probe (rerun; session-5 failure was a sys.path
#      bug in the probe script, fixed in ffe3390)
#   3. deformable long-budget A/B at the stable sweep corner (fp0.5 lr0.1,
#      1200 steps) vs rigid at the same budget -> budget-limited vs real gap
#   4. deformable trend extension: fp0.25 lr0.1 at 400 steps
set -u
cd /root/repo
mkdir -p outputs/r4
TS() { date -u +%H:%M:%S; }

echo "[$(TS)] phase decomposition (current step split)"
timeout 1800 python scratch/prof_phases.py > outputs/r4/phases.txt 2>&1
echo "rc=$?"; cat outputs/r4/phases.txt

echo "[$(TS)] within-block glue localization (incremental prefixes)"
timeout 1800 python scratch/prof_glue.py > outputs/r4/glue.txt 2>&1
echo "rc=$?"; cat outputs/r4/glue.txt

echo "[$(TS)] serving parity probe (rerun)"
timeout 1800 python scratch/prof_serving.py > outputs/r4/serving2.txt 2>&1
echo "rc=$?"; tail -6 outputs/r4/serving2.txt

echo "[$(TS)] deform long-budget A/B (fp0.5 lr0.1 x 1200 steps vs rigid)"
if [ ! -s outputs/r4/deform_long/results.json ]; then
  timeout 7200 python -m mvkpconv_tpu.tools.measure_variants \
    --steps 1200 --only kpconv_baseline,kpconv_deformable --save-checkpoints \
    --override deform_fitting_power=0.5 --override deform_lr_factor=0.1 \
    --out outputs/r4/deform_long > outputs/r4/deform_long.log 2>&1
fi
echo "rc=$? $(cat outputs/r4/deform_long/results.json 2>/dev/null | tr -d '\n ')"

echo "[$(TS)] deform trend extension (fp0.25 lr0.1 x 400)"
if [ ! -s outputs/r4/deform_fp0.25_lr0.1/results.json ]; then
  timeout 3600 python -m mvkpconv_tpu.tools.measure_variants \
    --steps 400 --only kpconv_deformable --save-checkpoints \
    --override deform_fitting_power=0.25 --override deform_lr_factor=0.1 \
    --out outputs/r4/deform_fp0.25_lr0.1 > outputs/r4/deform_fp0.25_lr0.1.log 2>&1
fi
echo "rc=$? $(cat outputs/r4/deform_fp0.25_lr0.1/results.json 2>/dev/null | tr -d '\n ')"

echo "[$(TS)] session-6 queue done"
