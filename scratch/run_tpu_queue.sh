#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 items 1-5, 8).
# Run as soon as the axon relay is reachable; every step logs under
# outputs/r4/ and survives individual failures so a mid-queue relay
# hiccup doesn't erase earlier results. bench.py runs FIRST (the round's
# number of record) and again LAST (post-optimization).
set -u
cd /root/repo
mkdir -p outputs/r4
TS() { date -u +%H:%M:%S; }

echo "[$(TS)] 1/6 bench (first green number of the round)"
timeout 2700 python bench.py > outputs/r4/bench_early.json 2> outputs/r4/bench_early.err
echo "rc=$? $(cat outputs/r4/bench_early.json 2>/dev/null)"

echo "[$(TS)] 2/6 remat A/B (train-step lever)"
timeout 2400 python scratch/prof_remat2.py > outputs/r4/remat_ab.txt 2>&1
echo "rc=$?"; tail -4 outputs/r4/remat_ab.txt

echo "[$(TS)] 3/6 influence-tail layout variants (trunk glue)"
timeout 2400 python scratch/prof_tail2.py > outputs/r4/tail_layouts.txt 2>&1
echo "rc=$?"; tail -8 outputs/r4/tail_layouts.txt
timeout 2400 python scratch/prof_hoist2.py > outputs/r4/hoist_variants.txt 2>&1
echo "rc=$?"; tail -8 outputs/r4/hoist_variants.txt
for bb in 8 16; do
  timeout 2400 python scratch/bench_b.py $bb > outputs/r4/bench_b$bb.txt 2>&1
  echo "rc=$? B=$bb"; tail -2 outputs/r4/bench_b$bb.txt
done
timeout 2400 python scratch/xla_issues/batched_dot_lowering.py \
  > outputs/r4/xla_batched_dot.txt 2>&1
echo "rc=$?"; tail -5 outputs/r4/xla_batched_dot.txt
timeout 2400 python scratch/xla_issues/minor_dim_layout_copies.py \
  > outputs/r4/xla_layout.txt 2>&1
echo "rc=$?"; tail -8 outputs/r4/xla_layout.txt

timeout 2400 python scratch/prof_block_decomp.py > outputs/r4/block_decomp.txt 2>&1
echo "rc=$?"; tail -9 outputs/r4/block_decomp.txt

echo "[$(TS)] 4/6 two-stage accuracy matrix (reference protocol)"
timeout 14400 python -m mvkpconv_tpu.tools.measure_variants \
  --steps 400 --out outputs/r4/variants_two_stage > outputs/r4/variants.log 2>&1
echo "rc=$?"; tail -12 outputs/r4/variants.log

echo "[$(TS)] 5/6 deformable sweep (fitting power x offset LR)"
for fp in 0.5 1.0 2.0; do
  for lr in 0.1 0.5 1.0; do
    tag="fp${fp}_lr${lr}"
    timeout 3600 python -m mvkpconv_tpu.tools.measure_variants \
      --steps 400 --only kpconv_deformable \
      --override deform_fitting_power=$fp --override deform_lr_factor=$lr \
      --out outputs/r4/deform_$tag \
      > outputs/r4/deform_$tag.log 2>&1
    echo "rc=$? $tag: $(cat outputs/r4/deform_$tag/results.json 2>/dev/null)"
  done
done

echo "[$(TS)] 6/6 bench (final)"
timeout 2700 python bench.py > outputs/r4/bench_final.json 2> outputs/r4/bench_final.err
echo "rc=$? $(cat outputs/r4/bench_final.json 2>/dev/null)"
echo "[$(TS)] queue done"
