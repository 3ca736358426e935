#!/bin/bash
# Round-5 stage A+B: the round-4g work that never ran (VERDICT r4 #1/#3).
# One TPU owner at a time; logs + .done markers live under repo-local
# .r5/log so a VM wipe cannot destroy the acceptance evidence again.
#   A: clean-lineage aux retrains — cond_polish (p70 mix), espcn_polish,
#      LPIPS features + threshold calibration, then the conditioning
#      acceptance contract on the untainted panel.
#   B: ARK generator at the 128px native base (warm start from the
#      packaged 64px run) + its class-accuracy eval.
# Benches/panels (the lost round-4d set) run in round5b_fleet.sh AFTER
# the per-scale-routing code lands.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/root/repo/.r5/log}
mkdir -p "$LOG"

ARK_STEPS=${ARK_STEPS:-40000}

stage() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== $name: already done"; return; fi
  echo "== $name: start $(date +%H:%M:%S)"
  local rc=0
  for attempt in 1 2 3; do
    timeout "$t" "$@" > "$LOG/$name.log" 2>&1
    rc=$?
    # rc=3 = tpu_guard: the axon lease had not released yet (the previous
    # stage exited the same second) -- wait and retry, never run on CPU
    [ $rc -ne 3 ] && break
    echo "== $name: TPU lease not attached (attempt $attempt); retrying in 30s"
    sleep 30
  done
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
  sleep 5  # let the TPU lease release before the next stage
}

CKPT=srs_tpu/models/checkpoints

# --- A: aux nets, clean lineage --------------------------------------
stage cond_polish 3600 python scripts/train_cond.py --mix p70
stage espcn_polish 3600 python scripts/train_polish.py
stage lpips 5400 python scripts/train_lpips.py
stage lpips_calib 1800 python scripts/fit_qa_models.py --only lpips
stage cond_accept 1800 python scripts/cond_panel.py

# --- B: ARK 128px native base (warm start from the packaged 64px) ----
stage ark128 10800 python scripts/train_ark.py --steps $ARK_STEPS --size 128 \
  --batch 32 --out /root/repo/.r5/ark128 --init-from $CKPT
stage ark128_eval 3600 python scripts/eval_ark.py \
  --checkpoint-dir /root/repo/.r5/ark128 --no-write

echo "ROUND5 FLEET A+B DONE $(date +%H:%M:%S)"
