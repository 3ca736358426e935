#!/bin/bash
# Round-4e: redo of the round-4 clean-lineage fleet after the VM wipe
# destroyed /tmp/r4_base + /tmp/r4_p70 (and the XLA cache). Trains the
# FINAL intended step counts directly (one cosine schedule per net is
# better than the 40k + 60k warm-restart extension the 4/4c split used).
# Outputs live under the repo (.r4/, gitignored) so another /tmp wipe
# cannot eat them.
#
# Step counts are env-overridable so a slow-chip day can be downshifted
# mid-fleet: kill, export XL2_STEPS=..., relaunch (done-markers skip
# finished stages).
set -u
cd "$(dirname "$0")/.."
LOG=${R4_LOG:-/root/repo/.r4/log}
BASE=/root/repo/.r4/base
P70=/root/repo/.r4/p70
mkdir -p "$LOG" "$BASE" "$P70"

XL2_STEPS=${XL2_STEPS:-100000}
XL3_STEPS=${XL3_STEPS:-60000}
XL4_STEPS=${XL4_STEPS:-60000}
L2_STEPS=${L2_STEPS:-60000}
L3_STEPS=${L3_STEPS:-40000}
E2_STEPS=${E2_STEPS:-30000}
R_STEPS=${R_STEPS:-40000}
FT_STEPS=${FT_STEPS:-6000}

stage() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return; fi
  echo "== $name: start $(date +%H:%M:%S)"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
}

# --- Phase 1: edsr_xl flagship ----------------------------------------
stage xl2_base 9000 python scripts/pretrain.py $BASE --only edsr_xl_x2 --steps $XL2_STEPS --mix v3
stage xl2_p70  2400 python scripts/pretrain.py $P70 --only edsr_xl_x2 --steps $FT_STEPS --mix p70 --lr 5e-5 --init-from $BASE
# Early flagship panel read while the rest trains.
stage panel_xl_x2 2400 python scripts/photo_eval.py --scale 2 --models edsr_xl,edsr_xl+ --checkpoint-dir $P70
stage xl3_base 6000 python scripts/pretrain.py $BASE --only edsr_xl_x3 --steps $XL3_STEPS --mix v3
stage xl4_base 6000 python scripts/pretrain.py $BASE --only edsr_xl_x4 --steps $XL4_STEPS --mix v3
stage xl3_p70  2400 python scripts/pretrain.py $P70 --only edsr_xl_x3 --steps $FT_STEPS --mix p70 --lr 5e-5 --init-from $BASE
stage xl4_p70  2400 python scripts/pretrain.py $P70 --only edsr_xl_x4 --steps $FT_STEPS --mix p70 --lr 5e-5 --init-from $BASE

# --- Phase 2: fallback tiers ------------------------------------------
stage l2_base 6000 python scripts/pretrain.py $BASE --only edsr_l_x2 --steps $L2_STEPS --mix v3
stage l3_base 4200 python scripts/pretrain.py $BASE --only edsr_l_x3 --steps $L3_STEPS --mix v3
stage e2_base 2400 python scripts/pretrain.py $BASE --only espcn_x2 --steps $E2_STEPS --mix v3
stage l2_p70  2400 python scripts/pretrain.py $P70 --only edsr_l_x2 --steps $FT_STEPS --mix p70 --lr 5e-5 --init-from $BASE
stage l3_p70  2400 python scripts/pretrain.py $P70 --only edsr_l_x3 --steps $FT_STEPS --mix p70 --lr 5e-5 --init-from $BASE
stage e2_p70  2400 python scripts/pretrain.py $P70 --only espcn_x2 --steps $FT_STEPS --mix p70 --lr 5e-5 --init-from $BASE

# --- Phase 3: robust tier ----------------------------------------------
stage r2_base 4200 python scripts/pretrain.py $BASE --only edsr_l_robust_x2 --steps $R_STEPS --mix v3
stage r3_base 4200 python scripts/pretrain.py $BASE --only edsr_l_robust_x3 --steps $R_STEPS --mix v3

# --- Phase 4: held-out panels, all candidates side by side -------------
stage panel_x2 3600 python scripts/photo_eval.py --scale 2 --models espcn,edsr_l,edsr_l+,edsr_xl,edsr_xl+,edsr_xl:ibp --checkpoint-dir $P70
stage panel_x3 3600 python scripts/photo_eval.py --scale 3 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir $P70
stage panel_x4 3600 python scripts/photo_eval.py --scale 4 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir $P70
stage panel_robust 2400 python scripts/photo_eval.py --scale 2 --models edsr_l,edsr_l_robust --degrade noise --checkpoint-dir $BASE

echo "ROUND4E FLEET DONE $(date +%H:%M:%S)"
