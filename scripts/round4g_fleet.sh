#!/bin/bash
# Round-4g: auxiliary clean-lineage retrains + ARK 128px (the round4b plan,
# re-homed to repo-local .r4/ after the /tmp VM wipes). Run AFTER
# round4f_fleet.sh + package_round4.sh + the round4d benches (one TPU owner
# at a time). Every photo-touching artifact retrains so its lineage is
# clean of EVAL_HOLDOUT_SOURCES:
#   - cond_polish (p70 mix), espcn_polish (v3 mix), LPIPS features
#   - ARK generator at the 128px native base (VERDICT r3 #4), warm-started
#     from the packaged 64px model
# then the acceptance evals that depend on them.
set -u
cd "$(dirname "$0")/.."
LOG=${R4_LOG:-/root/repo/.r4/log}
mkdir -p "$LOG"

ARK_STEPS=${ARK_STEPS:-40000}

stage() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return; fi
  echo "== $name: start $(date +%H:%M:%S)"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
}

CKPT=srs_tpu/models/checkpoints

# --- aux nets, clean lineage (packaged in place: x1 nets have no
# holdout-gated packaging decision — the contract checks run after) ----
stage cond_polish 3600 python scripts/train_cond.py --mix p70
stage espcn_polish 3600 python scripts/train_polish.py
stage lpips 5400 python scripts/train_lpips.py
stage lpips_calib 1800 python scripts/fit_qa_models.py --only lpips

# --- acceptance on the widened panel --------------------------------
stage cond_accept 1800 python scripts/cond_panel.py

# --- ARK 128px native base (warm start from the packaged 64px run) ---
stage ark128 10800 python scripts/train_ark.py --steps $ARK_STEPS --size 128 \
  --batch 32 --out /root/repo/.r4/ark128 --init-from $CKPT
stage ark128_eval 3600 python scripts/eval_ark.py --checkpoint-dir /root/repo/.r4/ark128 --no-write

echo "ROUND4G FLEET DONE $(date +%H:%M:%S)"
