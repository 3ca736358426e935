#!/bin/bash
# Round-5f fleet: widen the routed-panel acceptance to x3/x4 (the x2
# panel gates the shrink default; these record the same no-image-negative
# verdict at the other headline scales) and refresh the quality panel.
# Run AFTER round5e (one TPU process at a time).
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/root/repo/.r5/log}
mkdir -p "$LOG"

stage() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return; fi
  echo "== $name: start $(date +%H:%M:%S)"
  local rc=0
  for attempt in 1 2 3; do
    timeout "$t" "$@" > "$LOG/$name.log" 2>&1
    rc=$?
    [ $rc -ne 3 ] && break
    echo "== $name: TPU lease not attached (attempt $attempt); retrying in 30s"
    sleep 30
  done
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
  sleep 5
}

# x2 re-measure with LEAVE-ONE-OUT candidate selection (the in-sample
# selector picked edsr_l_tex on wood and served +0.018 where the clean
# net's shrinkage serves +0.107 — routing.best_shrink_candidate docstring)
stage routed_panel_loo 3600 python scripts/routed_panel.py
stage routed_panel_x3 3600 python scripts/routed_panel.py --scale 3
stage routed_panel_x4 3600 python scripts/routed_panel.py --scale 4

echo "ROUND5F FLEET DONE $(date +%H:%M:%S)"
