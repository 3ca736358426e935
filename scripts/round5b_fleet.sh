#!/bin/bash
# Round-5 stage C: the acceptance benches round 4 lost to the /tmp VM wipe
# (VERDICT r4 #2), re-homed durably (.r5/log + bench.py's BENCH_LOCAL
# auto-append), plus the post-selection panels and the fusion refit
# against the "+" self-ensemble members (VERDICT r4 #6).
# Run AFTER round5_fleet.sh (one TPU owner at a time).
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/root/repo/.r5/log}
mkdir -p "$LOG"

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

# --- benches (each row auto-appends to BENCH_LOCAL.md) ----------------
# Real-photo-mosaic input FIRST: it adjudicates the out-of-band
# brisque_delta +51.5 (input NR in-band by construction — either the
# output delta collapses [render-input artifact / scale transfer] or the
# artifacts are real).
stage bench_mosaic 5400 env SRS_BENCH_INPUT=mosaic python bench.py
stage bench_default 5400 python bench.py
stage bench_block1024 5400 env SRS_BENCH_BLOCK=1024 python bench.py
# selection A/B: pin edsr_xl for every step (the round-4 configuration)
stage bench_pinned 5400 env SRS_BENCH_PER_SCALE=0 python bench.py
# the round-3 configuration (edsr_l, trained-[2,2,3]-style ladder):
# explains the 81.99 -> 81.74 quality_score slip across the default flip
# (VERDICT r4 weak #2) by holding everything else fixed
stage bench_edsr_l 5400 env SRS_BENCH_QMODEL=edsr_l SRS_BENCH_PER_SCALE=0 python bench.py

# --- fusion refit against the "+" members (then panels measure it) ----
stage fusion_refit 3600 python scripts/fit_fusion.py --scales 2,3,4 \
  --members edsr_xl+,edsr_l+,edsr_xl,edsr_l,rcan,edsr_m,espcn,bicubic

# --- held-out photo panels, all packaged nets, durable EVAL blocks ----
stage panel_x2 4800 python scripts/photo_eval.py --scale 2 --write-eval \
  --models espcn,edsr_m,rcan,edsr_l,edsr_l+,edsr_l_robust,edsr_xl,edsr_xl+,fusion
stage panel_x3 4800 python scripts/photo_eval.py --scale 3 --write-eval \
  --models espcn,edsr_m,rcan,edsr_l,edsr_l+,edsr_l_robust,edsr_xl,edsr_xl+,fusion
stage panel_x4 4800 python scripts/photo_eval.py --scale 4 --write-eval \
  --models espcn,edsr_m,rcan,edsr_xl,edsr_xl+,fusion

# --- routed-default acceptance (SR-gain probe; no panel image negative)
stage routed_panel 3600 python scripts/routed_panel.py

# --- degradation-routing acceptance (noise panel) ---------------------
stage panel_robust 2400 python scripts/photo_eval.py --scale 2 --write-eval \
  --models edsr_xl,edsr_l,edsr_l_robust --degrade noise

# --- whole-pipeline procedural quality panel ---------------------------
stage quality_panel 3600 python scripts/quality_bench.py --n 4 --size 512

# --- zssr-from-prior ceiling probe (4 per-image fine-tunes) ------------
stage panel_zssr 3600 python scripts/photo_eval.py --scale 2 --models zssr \
  --write-eval

# --- wall-time cost rows for the quality alternatives (VERDICT r4 #6:
# the dB-per-second comparison must be written down; post-refit fusion).
# Last: their 8-pass / multi-net 4608px programs stress the remote
# compile helper and must not block the panels above.
stage bench_ensemble 5400 env SRS_BENCH_ENSEMBLE=1 python bench.py
stage bench_fusion 5400 env SRS_BENCH_PROVIDER=fusion python bench.py

echo "ROUND5B FLEET DONE $(date +%H:%M:%S)"
