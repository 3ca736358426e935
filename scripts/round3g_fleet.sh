#!/bin/bash
# Round-3g: edsr_xl — the MXU-native flagship (128 feature lanes; the
# on-chip probe showed 96-ch convs pay for 128 lanes anyway: +78% FLOPs
# for ~8% wall time). Pipeline mirrors round3d: v3 base train (run
# separately, /tmp/xl_base) -> p70 rehearsal fine-tune -> per-distribution
# evals. Packaging happens manually after reading the evals: edsr_xl must
# beat edsr_l on BOTH the procedural panel and the real-photo holdout.
# Runs AFTER the /tmp/xl_base training job (one TPU owner at a time).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet3g
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

stage xl2_base_eval 1800 python scripts/photo_eval.py --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir /tmp/xl_base
stage xl2_p70       4500 python scripts/pretrain.py /tmp/xl_p70 --only edsr_xl_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/xl_base
stage xl2_p70_eval  1800 python scripts/photo_eval.py --models edsr_xl,edsr_xl+,edsr_xl:ibp --checkpoint-dir /tmp/xl_p70
stage xl3_base      5400 python scripts/pretrain.py /tmp/xl_base --only edsr_xl_x3 --steps 40000 --mix v3
stage xl3_p70       4500 python scripts/pretrain.py /tmp/xl_p70 --only edsr_xl_x3 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/xl_base
stage xl3_p70_eval  1800 python scripts/photo_eval.py --models edsr_xl --scale 3 --checkpoint-dir /tmp/xl_p70
echo "ROUND3G DONE $(date +%H:%M:%S)"
