#!/bin/bash
# Session-8 relay supervisor: wait for the TPU relay, then fire the
# session-8 measurement queue (scratch/run_tpu_session8.sh).
set -u
cd /root/repo
mkdir -p outputs/r4
LOG=outputs/r4/supervisor8.log
TS() { date -u +%Y-%m-%dT%H:%M:%S; }

echo "[$(TS)] supervisor8 armed" >> "$LOG"
while true; do
  # socket up is not enough (it can 404 while the chip hangs): require a
  # real backend init + tiny computation
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" >> "$LOG" 2>&1; then
    echo "[$(TS)] relay UP (computation ran)" >> "$LOG"
    break
  fi
  echo "[$(TS)] relay still down" >> "$LOG"
  sleep 60
done

bash scratch/run_tpu_session8.sh >> "$LOG" 2>&1
echo "[$(TS)] supervisor8 done" >> "$LOG"
