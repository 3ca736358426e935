#!/bin/bash
# Round-3 retraining fleet: every packaged net retrained on the v3
# photo-statistics corpus (VERDICT r2 item 1), robust tier with the
# clean-passthrough degradation (item 2), LPIPS feature training (item 7)
# and the espcn_polish stage (item 5). Stages run SEQUENTIALLY — only one
# process may own the TPU (CLAUDE.md). Per-stage timeout guards the known
# hung-device failure mode; a killed stage just moves on (each stage is
# independently resumable by rerunning this script: pretrain merges into
# EVAL.json per net).
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

stage edsr_l_x2       12000 python scripts/pretrain.py --only edsr_l_x2 --steps 80000
stage espcn_x2         3600 python scripts/pretrain.py --only espcn_x2 --steps 30000
stage lpips            3600 python scripts/train_lpips.py --steps 1500
stage edsr_l_x3        9000 python scripts/pretrain.py --only edsr_l_x3 --steps 50000
stage robust_x2        9000 python scripts/pretrain.py --only edsr_l_robust_x2 --steps 50000
stage polish           3600 python scripts/train_polish.py --steps 20000
stage espcn_x3         3600 python scripts/pretrain.py --only espcn_x3 --steps 30000
stage robust_x3        7200 python scripts/pretrain.py --only edsr_l_robust_x3 --steps 40000
stage edsr_m_x2        5400 python scripts/pretrain.py --only edsr_m_x2 --steps 40000
stage edsr_m_x3        5400 python scripts/pretrain.py --only edsr_m_x3 --steps 40000
stage edsr_m_x4        5400 python scripts/pretrain.py --only edsr_m_x4 --steps 40000
stage rcan_x2          5400 python scripts/pretrain.py --only rcan_x2 --steps 40000
stage rcan_x3          5400 python scripts/pretrain.py --only rcan_x3 --steps 40000
stage rcan_x4          5400 python scripts/pretrain.py --only rcan_x4 --steps 40000
stage espcn_x4         3600 python scripts/pretrain.py --only espcn_x4 --steps 30000
echo "FLEET DONE $(date +%H:%M:%S)"
