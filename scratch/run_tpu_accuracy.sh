#!/bin/bash
# Round-4 TPU queue, part B: the LONG accuracy runs (two-stage matrix +
# deformable sweep), followed by a final bench. Fire after part A
# (scratch/run_tpu_probes.sh) and after applying any production perf wins.
set -u
cd /root/repo
mkdir -p outputs/r4
TS() { date -u +%H:%M:%S; }

echo "[$(TS)] two-stage accuracy matrix (reference protocol)"
timeout 14400 python -m mvkpconv_tpu.tools.measure_variants \
  --steps 400 --out outputs/r4/variants_two_stage > outputs/r4/variants.log 2>&1
echo "rc=$?"; tail -12 outputs/r4/variants.log

echo "[$(TS)] deformable sweep (fitting power x offset LR)"
for fp in 0.5 1.0 2.0; do
  for lr in 0.1 0.5 1.0; do
    tag="fp${fp}_lr${lr}"
    [ -s outputs/r4/deform_$tag/results.json ] && { echo "skip $tag (done)"; continue; }
    timeout 3600 python -m mvkpconv_tpu.tools.measure_variants \
      --steps 400 --only kpconv_deformable --save-checkpoints \
      --override deform_fitting_power=$fp --override deform_lr_factor=$lr \
      --out outputs/r4/deform_$tag \
      > outputs/r4/deform_$tag.log 2>&1
    echo "rc=$? $tag: $(cat outputs/r4/deform_$tag/results.json 2>/dev/null | tr -d '\n ')"
  done
done

echo "[$(TS)] deform inspection artifacts (offset stats per sweep point)"
for d in outputs/r4/deform_*/kpconv_deformable; do
  [ -d "$d/checkpoints" ] || continue
  timeout 1200 python -m mvkpconv_tpu.tools.inspect_deform \
    --config "$d/parameters.txt" --checkpoint "$d/checkpoints" \
    --output "$d/inspect" > "$d/inspect.log" 2>&1
  echo "rc=$? $d"
done

echo "[$(TS)] bench (final)"
timeout 2700 python bench.py > outputs/r4/bench_final.json 2> outputs/r4/bench_final.err
echo "rc=$? $(cat outputs/r4/bench_final.json 2>/dev/null)"
echo "[$(TS)] queue done"
