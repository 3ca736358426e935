#!/bin/bash
# Round-3f: post-packaging finalization on the real chip. Runs AFTER
# round3e_fleet.sh (one TPU owner at a time). The p70 winner checkpoints
# are already copied into srs_tpu/models/checkpoints; this rebuilds the
# derived artifacts and produces the round's closing measurements:
#   reeval        — refresh EVAL.json for the repackaged nets
#   fusion        — refit the fusion blend against the new members
#   photo_panel   — provider-stack rows on the real-photo holdout
#   qbench        — whole-pipeline quality panel (procedural + photo row)
#   proof200      — 200MP @ 16-bit max-preset proof run (VERDICT item 6)
#   bench         — headline bench line (throughput + MFU + NR panel)
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

stage reeval      1800 python scripts/reeval.py --only edsr_l_x2,espcn_x2,edsr_l_x3
stage fusion      2700 python scripts/fit_fusion.py --scales 2,3
stage photo_panel 3600 python scripts/photo_eval.py --models "espcn,edsr_l,edsr_l+,edsr_l:ibp,edsr_l+:ibp,fusion,zssr,zssr+"
# Robust-tier acceptance (VERDICT r2 item 2): on a noisy real input both
# the clean tier and the routed robust tier must beat bicubic.
stage photo_noisy 1800 python scripts/photo_eval.py --degrade noise --models "edsr_l,edsr_l_robust"
stage qbench      5400 python scripts/quality_bench.py --n 4 --size 512
stage proof200    3600 python scripts/proof_200mp.py
stage bench       2700 python bench.py
echo "ROUND3F DONE $(date +%H:%M:%S)"
