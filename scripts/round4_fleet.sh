#!/bin/bash
# Round-4 fleet: clean retrain of every photo-trained tier on the
# 14-source training pool (EVAL_HOLDOUT_SOURCES withheld, VERDICT r3 #2),
# then the 4-image held-out panel at x2/x3/x4.
#
# Why retrain from scratch: the v3 mix carries a 30% photo share, so every
# round-3 base/fine-tune saw the 3 images that are now the eval panel —
# panel numbers are only publishable for nets whose whole lineage is
# holdout-free. Bases at /tmp/r4_base (v3@p14), p70 rehearsal fine-tunes
# at /tmp/r4_p70. Packaging is MANUAL after reading the gates:
#   flagship flip = edsr_xl >= edsr_l on the procedural EVAL panel
#   (within 0.1 dB) AND >= on the photo-panel mean.
# One TPU owner at a time: run nothing else on the chip while this runs.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet4
mkdir -p $LOG

stage() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return; fi
  echo "== $name: start $(date +%H:%M:%S)"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
}

# --- Phase 1: edsr_xl flagship (x2/x3/x4 base + p70 rehearsal ft) ------
stage xl2_base 6000 python scripts/pretrain.py /tmp/r4_base --only edsr_xl_x2 --steps 40000 --mix v3
stage xl3_base 4200 python scripts/pretrain.py /tmp/r4_base --only edsr_xl_x3 --steps 40000 --mix v3
stage xl4_base 4200 python scripts/pretrain.py /tmp/r4_base --only edsr_xl_x4 --steps 40000 --mix v3
stage xl2_p70  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_xl_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage xl3_p70  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_xl_x3 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage xl4_p70  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_xl_x4 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base

# Early panel read on the flagship while the fallback tiers retrain.
stage panel_xl_x2 2400 python scripts/photo_eval.py --scale 2 --models edsr_xl,edsr_xl+ --checkpoint-dir /tmp/r4_p70

# --- Phase 2: quality/fast fallback tiers, clean lineage ---------------
stage l2_base 7200 python scripts/pretrain.py /tmp/r4_base --only edsr_l_x2 --steps 40000 --mix v3
stage l3_base 4200 python scripts/pretrain.py /tmp/r4_base --only edsr_l_x3 --steps 40000 --mix v3
stage e2_base 3600 python scripts/pretrain.py /tmp/r4_base --only espcn_x2 --steps 30000 --mix v3
stage l2_p70  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_l_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage l3_p70  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_l_x3 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage e2_p70  2400 python scripts/pretrain.py /tmp/r4_p70 --only espcn_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base

# --- Phase 3: the 4-image held-out panel, candidates side by side ------
stage panel_x2 3600 python scripts/photo_eval.py --scale 2 --models espcn,edsr_l,edsr_l+,edsr_xl,edsr_xl+,edsr_xl:ibp --checkpoint-dir /tmp/r4_p70
stage panel_x3 3600 python scripts/photo_eval.py --scale 3 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir /tmp/r4_p70
stage panel_x4 3600 python scripts/photo_eval.py --scale 4 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir /tmp/r4_p70

# --- Phase 4: robust tier, clean lineage (panel --degrade rows) --------
stage r2_base 3600 python scripts/pretrain.py /tmp/r4_base --only edsr_l_robust_x2 --steps 40000 --mix v3
stage r3_base 3600 python scripts/pretrain.py /tmp/r4_base --only edsr_l_robust_x3 --steps 40000 --mix v3
stage panel_robust 2400 python scripts/photo_eval.py --scale 2 --models edsr_l,edsr_l_robust --degrade noise --checkpoint-dir /tmp/r4_base

echo "ROUND4 FLEET DONE $(date +%H:%M:%S)"
