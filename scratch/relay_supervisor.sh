#!/bin/bash
# Round-4 relay supervisor: waits for the TPU relay (127.0.0.1:8093) to
# come back, then fires the measurement queue automatically:
#   1. SIGSTOP the CPU matrix hedge (1-core machine: it would starve the
#      TPU runs' host-side data generation),
#   2. run scratch/run_tpu_probes.sh   (quick perf probes, ~1h),
#   3. run scratch/run_tpu_accuracy.sh (two-stage matrix + deform sweep),
#   4. on success kill the CPU hedge (superseded); on failure SIGCONT it.
# Survives session restarts (launch with setsid + nohup).
set -u
cd /root/repo
CPU_PID=${1:-}
LOG=outputs/r4/supervisor.log
TS() { date -u +%Y-%m-%dT%H:%M:%S; }

echo "[$(TS)] supervisor armed (cpu hedge pid=${CPU_PID:-none})" >> "$LOG"
while true; do
  code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093/remote_compile)
  if [ "$code" != "000" ]; then
    echo "[$(TS)] relay UP (http $code)" >> "$LOG"
    break
  fi
  sleep 30
done

# Double-check the backend actually initializes (the socket can be up
# while the chip behind it is not).
if ! timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
  echo "[$(TS)] socket up but backend init failed; continuing to wait" >> "$LOG"
  exec "$0" "${CPU_PID:-}"
fi

if [ -n "${CPU_PID:-}" ] && kill -0 "$CPU_PID" 2>/dev/null; then
  kill -STOP "$CPU_PID" && echo "[$(TS)] paused CPU hedge $CPU_PID" >> "$LOG"
fi

echo "[$(TS)] running part A (probes)" >> "$LOG"
bash scratch/run_tpu_probes.sh >> outputs/r4/probes.log 2>&1
rcA=$?
echo "[$(TS)] part A rc=$rcA" >> "$LOG"

echo "[$(TS)] running part B (accuracy)" >> "$LOG"
bash scratch/run_tpu_accuracy.sh >> outputs/r4/accuracy.log 2>&1
rcB=$?
echo "[$(TS)] part B rc=$rcB" >> "$LOG"

if [ -n "${CPU_PID:-}" ] && kill -0 "$CPU_PID" 2>/dev/null; then
  if [ "$rcB" = 0 ] && [ -s outputs/r4/variants_two_stage/results.json ]; then
    kill -TERM "$CPU_PID" && echo "[$(TS)] killed CPU hedge (superseded)" >> "$LOG"
  else
    kill -CONT "$CPU_PID" && echo "[$(TS)] resumed CPU hedge" >> "$LOG"
  fi
fi
echo "[$(TS)] supervisor done (A=$rcA B=$rcB)" >> "$LOG"
