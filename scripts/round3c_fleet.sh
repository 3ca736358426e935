#!/bin/bash
# Round-3c: exploit the widened 17-source photo pool (photo_data.py) for
# the remaining VERDICT r2 items. Runs AFTER round3b_photo_ab.sh (one TPU
# owner at a time). Stages:
#   ft17_l2   — photo fine-tune of the packaged edsr_l_x2 on the widened
#               pool (the 5-photo version won round3b at +1.85 dB on the
#               holdout; this is the same recipe with 3.4x the sources).
#   ft17_l2_12k — longer fine-tune variant (does more help or overfit?).
#   ft17_e2   — same for espcn_x2 (fast tier; also a fusion member).
#   ft17_l3   — edsr_l_x3 photo fine-tune (keep x3 consistent).
#   lpips     — ranking-loss feature training (VERDICT item 7), packaged
#               directly into models/checkpoints/lpips_{vgg,alex}.
# Winners are packaged by hand after reading /tmp/fleet/*.log; fusion is
# refit afterwards (scripts/fit_fusion.py) against the new members.
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

stage ft17_l2       2700 python scripts/pretrain.py /tmp/ft17_l2 --only edsr_l_x2 --steps 6000 --mix photo --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage ft17_l2_eval  1800 python scripts/photo_eval.py --models edsr_l,edsr_l+ --checkpoint-dir /tmp/ft17_l2
stage ft17_l2_12k      3600 python scripts/pretrain.py /tmp/ft17_l2_12k --only edsr_l_x2 --steps 12000 --mix photo --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage ft17_l2_12k_eval 1800 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ft17_l2_12k
stage ft17_e2       2700 python scripts/pretrain.py /tmp/ft17_e2 --only espcn_x2 --steps 6000 --mix photo --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage ft17_e2_eval  1800 python scripts/photo_eval.py --models espcn --checkpoint-dir /tmp/ft17_e2
stage ft17_l3       2700 python scripts/pretrain.py /tmp/ft17_l3 --only edsr_l_x3 --steps 6000 --mix photo --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage ft17_l3_eval  1800 python scripts/photo_eval.py --models edsr_l --scale 3 --checkpoint-dir /tmp/ft17_l3
stage lpips         5400 python scripts/train_lpips.py --steps 1500
echo "ROUND3C DONE $(date +%H:%M:%S)"
