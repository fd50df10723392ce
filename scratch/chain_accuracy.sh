#!/bin/bash
# Round-4 session-5 chain: wait for the probe queue (part A) to finish,
# then immediately fire the long accuracy queue (part B) so the TPU never
# idles while the relay is up. Detach with setsid+nohup.
set -u
cd /root/repo
while ! grep -q 'probes done' outputs/r4/probes.log 2>/dev/null; do
  # If the probe process died without the sentinel, bail out after it is
  # gone AND the log has been quiet for 10 minutes, and run accuracy anyway.
  if [ -f /tmp/probes.pid ] && ! kill -0 "$(cat /tmp/probes.pid)" 2>/dev/null; then
    age=$(( $(date +%s) - $(stat -c %Y outputs/r4/probes.log 2>/dev/null || echo 0) ))
    [ "$age" -gt 600 ] && break
  fi
  sleep 60
done
bash scratch/run_tpu_accuracy.sh >> outputs/r4/accuracy.log 2>&1
