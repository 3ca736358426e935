#!/bin/bash
# Round-3 retraining fleet v2: every packaged net retrained on the v3
# photo-statistics corpus (VERDICT r2 item 1), robust tier with the
# clean-passthrough degradation (item 2), LPIPS feature training (item 7,
# device-resident rewrite) and the espcn_polish stage (item 5). Stages run
# SEQUENTIALLY — only one process may own the TPU (CLAUDE.md). Per-stage
# timeout guards the known hung-device failure mode; a killed stage just
# moves on (each stage is independently resumable by rerunning this
# script: pretrain merges into EVAL.json per net).
#
# v2 changes after the 12k-vs-80k and grain A/Bs (/tmp/ab_*):
# - hr_grain dropped (falsified: +0.01 dB on the photo holdout at both
#   espcn and edsr_l scale);
# - edsr_m/rcan/espcn_x4 at 30k (the 12k flagship beat the 80k one on the
#   real photo by +0.13 dB — shorter schedules generalize better, and the
#   mid tiers exist for fusion diversity, not corpus records);
# - lpips stage uses the device-resident trainer (the v1 stage shipped
#   4.7 MB/step over the ~30 MB/s tunnel and timed out at step ~400).
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

stage edsr_l_x3        9000 python scripts/pretrain.py --only edsr_l_x3 --steps 50000
stage robust_x2        9000 python scripts/pretrain.py --only edsr_l_robust_x2 --steps 50000
stage lpips2           3600 python scripts/train_lpips.py --steps 1500
stage polish           3600 python scripts/train_polish.py --steps 20000
stage espcn_x3         3600 python scripts/pretrain.py --only espcn_x3 --steps 30000
stage robust_x3        7200 python scripts/pretrain.py --only edsr_l_robust_x3 --steps 40000
stage edsr_m_x2        4500 python scripts/pretrain.py --only edsr_m_x2 --steps 30000
stage rcan_x2          4500 python scripts/pretrain.py --only rcan_x2 --steps 30000
stage edsr_m_x3        4500 python scripts/pretrain.py --only edsr_m_x3 --steps 30000
stage rcan_x3          4500 python scripts/pretrain.py --only rcan_x3 --steps 30000
stage edsr_m_x4        4500 python scripts/pretrain.py --only edsr_m_x4 --steps 30000
stage rcan_x4          4500 python scripts/pretrain.py --only rcan_x4 --steps 30000
stage espcn_x4         3600 python scripts/pretrain.py --only espcn_x4 --steps 30000
echo "FLEET DONE $(date +%H:%M:%S)"
