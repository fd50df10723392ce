#!/bin/bash
# CPU fallback, stage 2 (round 4): after the CPU two-stage matrix hedge
# (PID $1) finishes, run a reduced deformable sweep on the CPU backend —
# but ONLY if the relay is still down (if it's up, relay_supervisor.sh is
# already running the real TPU sweep and this hedge is superseded).
set -u
cd /root/repo
PID=${1:?usage: cpu_followup.sh <matrix_pid>}
LOG=outputs/r4/cpu_followup.log
TS() { date -u +%H:%M:%S; }

while kill -0 "$PID" 2>/dev/null; do sleep 120; done
code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093/remote_compile)
if [ "$code" != "000" ]; then
  echo "[$(TS)] relay up ($code) — TPU queue owns the sweep; exiting" >> "$LOG"
  exit 0
fi
echo "[$(TS)] matrix done, relay still down — CPU deformable sweep" >> "$LOG"

# rigid baseline at the SWEEP shapes (the sweep's comparison point —
# the matrix baseline above runs at different num_points/batch)
if [ ! -s outputs/r4/deform_cpu_rigid/results.json ]; then
  python - <<'EOF' > outputs/r4/deform_cpu_rigid.log 2>&1
import jax; jax.config.update("jax_platforms", "cpu")
from mvkpconv_tpu.tools import measure_variants
measure_variants.main([
    "--steps", "300", "--only", "kpconv_baseline",
    "--out", "outputs/r4/deform_cpu_rigid",
    "--override", "num_points=(4096,1024,256,128,64)",
    "--override", "conv_neighbors=(20,20,20,20,20)",
    "--override", "pool_neighbors=(20,20,20,20)",
    "--override", "batch_num=2",
])
EOF
  echo "[$(TS)] rigid rc=$? $(tr -d '\n ' < outputs/r4/deform_cpu_rigid/results.json 2>/dev/null)" >> "$LOG"
fi

for combo in "0.5 0.5" "0.5 1.0" "2.0 0.5" "2.0 1.0" "1.0 0.1"; do
  set -- $combo
  fp=$1; lr=$2
  tag="fp${fp}_lr${lr}"
  [ -s "outputs/r4/deform_cpu_$tag/results.json" ] && continue
  python - "$fp" "$lr" <<'EOF' > "outputs/r4/deform_cpu_$tag.log" 2>&1
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from mvkpconv_tpu.tools import measure_variants
fp, lr = sys.argv[1], sys.argv[2]
measure_variants.main([
    "--steps", "300", "--only", "kpconv_deformable", "--save-checkpoints",
    "--out", f"outputs/r4/deform_cpu_fp{fp}_lr{lr}",
    "--override", "num_points=(4096,1024,256,128,64)",
    "--override", "conv_neighbors=(20,20,20,20,20)",
    "--override", "pool_neighbors=(20,20,20,20)",
    "--override", "deform_conv_neighbors=(28,28,28,28,28)",
    "--override", "deform_pool_neighbors=(28,28,28,28)",
    "--override", "batch_num=2",
    "--override", f"deform_fitting_power={fp}",
    "--override", f"deform_lr_factor={lr}",
])
EOF
  echo "[$(TS)] $tag rc=$? $(tr -d '\n ' < outputs/r4/deform_cpu_$tag/results.json 2>/dev/null)" >> "$LOG"
  d="outputs/r4/deform_cpu_$tag/kpconv_deformable"
  if [ -d "$d/checkpoints" ]; then
    python -m mvkpconv_tpu.tools.inspect_deform \
      --config "$d/parameters.txt" --checkpoint "$d/checkpoints" \
      --output "$d/inspect" > "$d/inspect.log" 2>&1
    echo "[$(TS)] inspect $tag rc=$?" >> "$LOG"
  fi
  # bail out mid-sweep if the relay comes back (TPU sweep supersedes)
  code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093/remote_compile)
  [ "$code" != "000" ] && { echo "[$(TS)] relay back — stopping" >> "$LOG"; exit 0; }
done
echo "[$(TS)] cpu follow-up done" >> "$LOG"
