#!/bin/bash
# Round-3 photo-generalization A/B ladder (runs AFTER round3_fleet.sh —
# one TPU owner at a time). Tests the two remaining hypotheses for the
# real-photo gap (VERDICT r2 item 1, target edsr_l x2 >= +2.5 dB on the
# held-out photograph):
#   v4   — JPEG round-tripped HR truth (consumer photos ARE JPEGs; the
#          HR target carries compression statistics a clean-HR net
#          cannot predict) + larger real-photo share.
#   ft   — short photo-only fine-tune (mix=photo, low LR) on top of the
#          best corpus-trained checkpoint.
# Also re-scores the robust tier's degraded panel (the original eval
# sampled the clean passthrough arm — see models/train.py degrade()).
# Winners are packaged manually after reading /tmp/fleet/ab_*.log.
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

stage reeval_robust 1800 python scripts/reeval.py --only edsr_l_robust_x2,edsr_l_robust_x3
stage ab_v4      2400 python scripts/pretrain.py /tmp/ab_v4 --only edsr_l_x2 --steps 12000 --mix v4
stage ab_v4_eval  900 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ab_v4
stage ab_ft_v3   1800 python scripts/pretrain.py /tmp/ab_ft_v3 --only edsr_l_x2 --steps 6000 --mix photo --lr 5e-5 --init-from /tmp/ab_nograin
stage ab_ft_v3_eval 900 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ab_ft_v3
stage ab_ft_v4   1800 python scripts/pretrain.py /tmp/ab_ft_v4 --only edsr_l_x2 --steps 6000 --mix photo --lr 5e-5 --init-from /tmp/ab_v4
stage ab_ft_v4_eval 900 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ab_ft_v4
echo "PHOTO AB DONE $(date +%H:%M:%S)"
