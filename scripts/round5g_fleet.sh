#!/bin/bash
# Round-5g fleet: routed-panel acceptance at every headline scale after
# the probe-crop ladder fix (routing._fit_crop) and the tex-tier
# demotion. Round-5f found the probe silently disabled at x3/x4 — the
# panel LR inputs (140x168, 105x126) were smaller than the fixed 192px
# probe crop, so wood served -0.514 dB unprotected at x3. The ladder
# steps 192 -> 128 -> 96; these stages record the re-measured
# routed_panel blocks into EVAL.json and gate on no-image-negative.
# Run alone (one TPU process at a time).
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

# x2: re-measure the default (tex tier demoted -> the clean net's own
# shrinkage serves wood again, +0.107 expected)
stage routed_panel_final 3600 python scripts/routed_panel.py
# x3/x4: first runs where the probe can engage at these scales
stage routed_panel_final_x3 3600 python scripts/routed_panel.py --scale 3
stage routed_panel_final_x4 3600 python scripts/routed_panel.py --scale 4

echo "ROUND5G FLEET DONE $(date +%H:%M:%S)"
