#!/bin/bash
# Round-4f: the round-4 clean-lineage retrain fleet, restructured for a
# DEGRADED tunnel link (h2d measured ~1-3 MB/s today vs the usual ~30).
# The killer was the 2.4 GB float32 corpus upload per pretrain invocation;
# pretrain.py now uploads a 600 MB uint8 corpus ONCE PER PROCESS, so this
# fleet batches nets per invocation (one upload each) instead of round4e's
# one-invocation-per-net. Flagship (edsr_xl) trains and panels first so an
# early cutoff still leaves the default-flip gate readable.
#
# Step counts env-overridable for chip-weather downshifts; done-markers
# skip finished stages and pretrain.py --skip-existing resumes inside a
# partially finished multi-net stage.
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

# --- Phase 1: edsr_xl flagship (one v3 upload, one p70 upload) ---------
stage bases_xl 12000 python scripts/pretrain.py $BASE --mix v3 --skip-existing \
  --only edsr_xl_x2,edsr_xl_x3,edsr_xl_x4 \
  --steps-map edsr_xl_x2=$XL2_STEPS,edsr_xl_x3=$XL3_STEPS,edsr_xl_x4=$XL4_STEPS
stage ft_xl 4800 python scripts/pretrain.py $P70 --mix p70 --lr 5e-5 --skip-existing \
  --init-from $BASE --steps $FT_STEPS \
  --only edsr_xl_x2,edsr_xl_x3,edsr_xl_x4
# Early flagship panel read while the rest trains.
stage panel_xl_x2 2700 python scripts/photo_eval.py --scale 2 --models edsr_xl,edsr_xl+ --checkpoint-dir $P70

# --- Phase 2: fallback + robust tiers (one v3 upload, one p70 upload) --
stage bases_rest 12000 python scripts/pretrain.py $BASE --mix v3 --skip-existing \
  --only edsr_l_x2,edsr_l_x3,edsr_l_robust_x2,edsr_l_robust_x3,espcn_x2 \
  --steps-map edsr_l_x2=$L2_STEPS,edsr_l_x3=$L3_STEPS,edsr_l_robust_x2=$R_STEPS,edsr_l_robust_x3=$R_STEPS,espcn_x2=$E2_STEPS
stage ft_rest 3600 python scripts/pretrain.py $P70 --mix p70 --lr 5e-5 --skip-existing \
  --init-from $BASE --steps $FT_STEPS \
  --only edsr_l_x2,edsr_l_x3,espcn_x2

# --- Phase 3: held-out panels, all candidates side by side -------------
stage panel_x2 3600 python scripts/photo_eval.py --scale 2 --models espcn,edsr_l,edsr_l+,edsr_xl,edsr_xl+,edsr_xl:ibp --checkpoint-dir $P70
stage panel_x3 3600 python scripts/photo_eval.py --scale 3 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir $P70
stage panel_x4 3600 python scripts/photo_eval.py --scale 4 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir $P70
stage panel_robust 2700 python scripts/photo_eval.py --scale 2 --models edsr_l,edsr_l_robust --degrade noise --checkpoint-dir $BASE

echo "ROUND4F FLEET DONE $(date +%H:%M:%S)"
