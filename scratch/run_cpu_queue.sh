#!/bin/bash
# CPU fallback queue (relay outage): wait for the two-stage matrix hedge to
# finish, then run a reduced deformable sweep (fitting power x offset LR)
# on the CPU backend. Killed and superseded by scratch/run_tpu_queue.sh
# the moment the relay returns.
set -u
cd /root/repo
MATRIX_PID=${1:?usage: run_cpu_queue.sh <matrix_pid>}

while kill -0 "$MATRIX_PID" 2>/dev/null; do sleep 60; done
echo "[$(date -u +%H:%M:%S)] matrix done; starting deform sweep"

for combo in "0.5 0.5" "0.5 1.0" "2.0 0.5" "2.0 1.0"; do
  set -- $combo
  fp=$1; lr=$2
  tag="fp${fp}_lr${lr}"
  python - "$fp" "$lr" "$tag" <<'EOF' > outputs/r4/deform_cpu_$tag.log 2>&1
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from mvkpconv_tpu.tools import measure_variants
fp, lr, tag = sys.argv[1], sys.argv[2], sys.argv[3]
measure_variants.main([
    "--steps", "300", "--only", "kpconv_deformable",
    "--out", f"outputs/r4/deform_cpu_{tag}",
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
  echo "[$(date -u +%H:%M:%S)] $tag rc=$? $(cat outputs/r4/deform_cpu_$tag/results.json 2>/dev/null | tr -d '\n ')"
done
echo "[$(date -u +%H:%M:%S)] cpu queue done"
