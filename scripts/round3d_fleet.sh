#!/bin/bash
# Round-3d: rehearsal fine-tunes on the p70 mix (70% photo mosaics + 30%
# clean procedural replay). Round-3b/3c photo-only fine-tunes lifted the
# real-photo holdout to +1.86 dB but cost 1.1-2.5 dB on the procedural
# eval panel — over VERDICT r2's 0.5 dB regression budget. p70's replay
# arm is the panel distribution itself, so the fine-tune should keep the
# panel while learning photo statistics. Also measures the provider-level
# stack on the holdout: self-ensemble (+), area-consistent IBP (:ibp),
# zssr per-image adaptation, fusion.
# Runs AFTER round3c_fleet.sh (one TPU owner at a time).
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

PANEL="espcn,edsr_l,edsr_l+,edsr_l:ibp,edsr_l+:ibp,fusion,zssr,zssr+"

stage p70_l2       4500 python scripts/pretrain.py /tmp/p70_l2 --only edsr_l_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage p70_l2_eval  1800 python scripts/photo_eval.py --models edsr_l,edsr_l+,edsr_l:ibp,edsr_l+:ibp --checkpoint-dir /tmp/p70_l2
stage p70_l2_12k      3600 python scripts/pretrain.py /tmp/p70_l2_12k --only edsr_l_x2 --steps 12000 --mix p70 --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage p70_l2_12k_eval 1800 python scripts/photo_eval.py --models edsr_l,edsr_l+ --checkpoint-dir /tmp/p70_l2_12k
stage p70_e2       2700 python scripts/pretrain.py /tmp/p70_e2 --only espcn_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage p70_e2_eval  1800 python scripts/photo_eval.py --models espcn --checkpoint-dir /tmp/p70_e2
stage p70_l3       2700 python scripts/pretrain.py /tmp/p70_l3 --only edsr_l_x3 --steps 6000 --mix p70 --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage p70_l3_eval  1800 python scripts/photo_eval.py --models edsr_l,edsr_l+ --scale 3 --checkpoint-dir /tmp/p70_l3
# Provider-level stack on the PACKAGED checkpoints (baseline for the
# per-distribution claims; rerun after packaging winners).
stage panel_packaged 3600 python scripts/photo_eval.py --models "$PANEL"
echo "ROUND3D DONE $(date +%H:%M:%S)"
