#!/bin/bash
# Round-4b fleet: auxiliary retrains on the 14-source pool + ARK 128px.
# Run AFTER round4_fleet.sh and the manual packaging step (one TPU owner
# at a time). Every photo-touching artifact retrains so its lineage is
# clean of the EVAL_HOLDOUT_SOURCES:
#   - cond_polish (p70 mix), espcn_polish (v3 mix), LPIPS features
#   - ARK generator, now at the 128px native base (VERDICT r3 #4) with a
#     warm start from the packaged 64px model
# then the acceptance evals that depend on them.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet4b
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
stage ark128 9000 python scripts/train_ark.py --steps 40000 --size 128 --batch 32 --out /tmp/ark128 --init-from $CKPT
stage ark128_eval 3600 python scripts/eval_ark.py --checkpoint-dir /tmp/ark128 --no-write
# gen_quality (2K NIQE + refine A/B) runs manually AFTER the 128px model
# is packaged: it generates through the packaged-checkpoint path.

echo "ROUND4B FLEET DONE $(date +%H:%M:%S)"
