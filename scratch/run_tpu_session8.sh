#!/bin/bash
# Session-8 TPU queue: gather-transpose measurement chain.
#   1. prof_scatter4     stage decomposition of the sorted pipeline
#   2. prof_scatter5     windowed one-hot XLA pipeline timing
#   3. prof_transpose_ab decisive end-to-end vag A/B (scatter/sorted/window)
#   4. bench.py          reconfirm the 10.39x headline still stands
# Results tee into scratch/r4s8_results.txt (git-trackable; outputs/ is
# ignored and containers are recycled between sessions).
set -u
cd /root/repo
mkdir -p outputs/r4
OUT=scratch/r4s8_results.txt
TS() { date -u +%Y-%m-%dT%H:%M:%S; }

run() {
  name=$1; shift
  echo "=== [$(TS)] $name ===" | tee -a "$OUT"
  # full output to its own file; only a head of it into the rollup
  timeout 1200 "$@" > "outputs/r4/s8_$name.log" 2>&1
  rc=$?
  grep -v "WARNING\|WARN\b" "outputs/r4/s8_$name.log" | head -60 >> "$OUT"
  echo "--- rc=$rc ---" | tee -a "$OUT"
}

run prof_scatter4 python scratch/prof_scatter4.py
run prof_scatter5 python scratch/prof_scatter5.py
run prof_transpose_ab python scratch/prof_transpose_ab.py
run bench python bench.py
echo "=== [$(TS)] session-8 queue done ===" | tee -a "$OUT"
