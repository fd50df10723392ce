#!/bin/bash
# Round-4 TPU queue, part A: the QUICK perf probes (~1h). Runs first so
# production wins can be applied and re-benched while the relay is up;
# the long accuracy runs live in scratch/run_tpu_accuracy.sh.
# Ordered by decision value: the round's green bench number first, then
# the two production levers (g-form tail, remat), then diagnostics.
set -u
cd /root/repo
mkdir -p outputs/r4
TS() { date -u +%H:%M:%S; }

if [ ! -s outputs/r4/bench_early.json ]; then
  echo "[$(TS)] bench (first green number of the round)"
  timeout 2700 python bench.py > outputs/r4/bench_early.json 2> outputs/r4/bench_early.err
  echo "rc=$? $(cat outputs/r4/bench_early.json 2>/dev/null)"
fi

echo "[$(TS)] g-form end-to-end bench A/B (production-gated kpconv_tail)"
for tail in gform_dot gform_vpu; do
  [ -s outputs/r4/bench_$tail.json ] && continue
  BENCH_OVERRIDES="kpconv_tail=$tail" timeout 2700 python bench.py \
    > outputs/r4/bench_$tail.json 2> outputs/r4/bench_$tail.err
  echo "rc=$? $tail: $(cat outputs/r4/bench_$tail.json 2>/dev/null)"
done

echo "[$(TS)] remat A/B (train-step lever)"
if [ ! -s outputs/r4/remat_ab.txt ]; then
  timeout 2400 python scratch/prof_remat2.py > outputs/r4/remat_ab.txt 2>&1
fi
echo "rc=$?"; tail -4 outputs/r4/remat_ab.txt

echo "[$(TS)] combined levers bench (gform_dot + remat=blocks)"
if [ ! -s outputs/r4/bench_combo.json ]; then
  BENCH_OVERRIDES="kpconv_tail=gform_dot,remat=blocks" timeout 2700 python bench.py \
    > outputs/r4/bench_combo.json 2> outputs/r4/bench_combo.err
  echo "rc=$? combo: $(cat outputs/r4/bench_combo.json 2>/dev/null)"
fi

echo "[$(TS)] batch-size scaling"
for bb in 8 16; do
  if [ ! -s outputs/r4/bench_b$bb.txt ]; then
    timeout 2400 python scratch/bench_b.py $bb > outputs/r4/bench_b$bb.txt 2>&1
  fi
  echo "rc=$? B=$bb"; tail -2 outputs/r4/bench_b$bb.txt
done

echo "[$(TS)] g-form KPConv standalone variants (VERDICT #5 attempt)"
if [ ! -s outputs/r4/gform.txt ]; then
  timeout 2400 python scratch/prof_gform.py > outputs/r4/gform.txt 2>&1
fi
echo "rc=$?"; tail -16 outputs/r4/gform.txt

echo "[$(TS)] influence-tail layout variants (trunk glue)"
if [ ! -s outputs/r4/tail_layouts.txt ]; then
  timeout 2400 python scratch/prof_tail2.py > outputs/r4/tail_layouts.txt 2>&1
fi
echo "rc=$?"; tail -8 outputs/r4/tail_layouts.txt
if [ ! -s outputs/r4/hoist_variants.txt ]; then
  timeout 2400 python scratch/prof_hoist2.py > outputs/r4/hoist_variants.txt 2>&1
fi
echo "rc=$?"; tail -8 outputs/r4/hoist_variants.txt

echo "[$(TS)] XLA issue repros (measured evidence for upstream filing)"
if [ ! -s outputs/r4/xla_batched_dot.txt ]; then
  timeout 2400 python scratch/xla_issues/batched_dot_lowering.py \
    > outputs/r4/xla_batched_dot.txt 2>&1
fi
echo "rc=$?"; tail -5 outputs/r4/xla_batched_dot.txt
if [ ! -s outputs/r4/xla_layout.txt ]; then
  timeout 2400 python scratch/xla_issues/minor_dim_layout_copies.py \
    > outputs/r4/xla_layout.txt 2>&1
fi
echo "rc=$?"; tail -8 outputs/r4/xla_layout.txt

echo "[$(TS)] serving-artifact parity (exported StableHLO vs live jit)"
if [ ! -s outputs/r4/serving.txt ]; then
  timeout 2400 python scratch/prof_serving.py > outputs/r4/serving.txt 2>&1
fi
echo "rc=$?"; tail -8 outputs/r4/serving.txt

echo "[$(TS)] resnetb sub-op decomposition"
if [ ! -s outputs/r4/block_decomp.txt ]; then
  timeout 2400 python scratch/prof_block_decomp.py > outputs/r4/block_decomp.txt 2>&1
fi
echo "rc=$?"; tail -9 outputs/r4/block_decomp.txt

echo "[$(TS)] probes done"
