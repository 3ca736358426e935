#!/bin/bash
# Round-3h: direct edsr_xl x4 net vs the [2,2] ladder of x2 nets.
# The quality tier currently serves x4 by composing the trained x2 net
# twice (trained-aware scale_ladder); a direct x4 head amortizes the
# body over one pass (1/4 the body FLOPs of the ladder's second step)
# and learns the full 4x inverse jointly. Package only if the direct
# net beats the packaged ladder on BOTH the procedural panel and the
# photo holdout at x4. Runs AFTER round3g (one TPU owner at a time).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet3h
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

# Ladder baseline first: packaged edsr_xl x2 composed [2,2] at x4.
stage xl4_ladder_eval 2400 python scripts/photo_eval.py --scale 4 --models edsr_l,edsr_xl,edsr_xl+
stage xl4_base        6000 python scripts/pretrain.py /tmp/xl_base --only edsr_xl_x4 --steps 40000 --mix v3
stage xl4_p70         4500 python scripts/pretrain.py /tmp/xl_p70 --only edsr_xl_x4 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/xl_base
stage xl4_p70_eval    2400 python scripts/photo_eval.py --scale 4 --models edsr_xl,edsr_xl+ --checkpoint-dir /tmp/xl_p70
echo "ROUND3H DONE $(date +%H:%M:%S)"
