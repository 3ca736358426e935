#!/bin/bash
# Round-3e: train the prompt-conditioned polish (models/conditioning.py,
# VERDICT r2 missing #4) and evaluate. Runs AFTER round3d_fleet.sh (one
# TPU owner at a time).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet
mkdir -p $LOG

stage() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return; fi
  echo "== $name: start $(date +%H:%M:%S)"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
}

stage cond_polish 5400 python scripts/train_cond.py --steps 20000
# lpips retry: round3c's lpips stage can lose its 90-min budget to host
# contention during pair building; stage() skips this when it succeeded.
stage lpips 7200 python scripts/train_lpips.py --steps 1500
echo "ROUND3E DONE $(date +%H:%M:%S)"
