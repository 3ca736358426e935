#!/bin/bash
# Round-3b: rerun of the photo-generalization A/B ladder (round3_photo_ab.sh
# results were lost with /tmp). Same hypotheses for VERDICT r2 item 1
# (target: edsr_l x2 >= +2.5 dB over bicubic on the held-out photograph;
# packaged v3 checkpoint stands at +1.56):
#   reeval  — re-score edsr_l_robust_x2's degraded panel (its EVAL.json row
#             still shows clean==degraded, i.e. predates the eval fix).
#   ab_v4   — JPEG round-tripped HR mix, 12k steps from scratch.
#   ab_ft_v3— photo-only low-LR fine-tune FROM the packaged v3 checkpoint.
#   ab_ft_v4— same fine-tune from the v4 A/B checkpoint.
# Stages run SEQUENTIALLY — only one process may own the TPU (CLAUDE.md).
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

stage reeval_robust 2700 python scripts/reeval.py --only edsr_l_robust_x2
stage ab_v4         3600 python scripts/pretrain.py /tmp/ab_v4 --only edsr_l_x2 --steps 12000 --mix v4
stage ab_v4_eval    1800 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ab_v4
stage ab_ft_v3      2700 python scripts/pretrain.py /tmp/ab_ft_v3 --only edsr_l_x2 --steps 6000 --mix photo --lr 5e-5 --init-from srs_tpu/models/checkpoints
stage ab_ft_v3_eval 1800 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ab_ft_v3
stage ab_ft_v4      2700 python scripts/pretrain.py /tmp/ab_ft_v4 --only edsr_l_x2 --steps 6000 --mix photo --lr 5e-5 --init-from /tmp/ab_v4
stage ab_ft_v4_eval 1800 python scripts/photo_eval.py --models edsr_l --checkpoint-dir /tmp/ab_ft_v4
echo "ROUND3B DONE $(date +%H:%M:%S)"
