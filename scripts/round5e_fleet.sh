#!/bin/bash
# Round-5e fleet: the texture tier (ROADMAP known-gap #3).
#
# Trains edsr_l_tex (edsr_l fine-tuned on the "tex" mix of photographed
# stationary materials — photo_data.TEXTURE_SOURCES, never the held-out
# wood family), records its held-out panel block, then re-measures the
# routed panel: probe-negative inputs now compare the clean net's
# shrinkage against the texture net's on their own crops and serve the
# winner (routing.best_shrink_candidate). Bench sanity row last.
#
# Usage: bash scripts/round5e_fleet.sh  (run alone: ONE TPU process at a time)
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
    # rc=3 = tpu_guard: the axon lease had not released yet -- retry,
    # never run on CPU
    [ $rc -ne 3 ] && break
    echo "== $name: TPU lease not attached (attempt $attempt); retrying in 30s"
    sleep 30
  done
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
  sleep 5
}

# Seed the fine-tune: edsr_l_tex shares edsr_l's architecture, so its
# warm start is the packaged edsr_l_x2 checkpoint under the tex name.
if [ ! -d /tmp/init_tex/edsr_l_tex_x2 ]; then
  mkdir -p /tmp/init_tex
  cp -r srs_tpu/models/checkpoints/edsr_l_x2 /tmp/init_tex/edsr_l_tex_x2
fi

stage tex_train 5400 python scripts/pretrain.py --only edsr_l_tex_x2 \
  --mix tex --init-from /tmp/init_tex --lr 1e-4
stage tex_photo_eval 3600 python scripts/photo_eval.py \
  --models edsr_l_tex,edsr_l_tex+ --write-eval
stage routed_panel_tex 3600 python scripts/routed_panel.py
stage bench_post_tex 5400 python bench.py

echo "ROUND5E FLEET DONE $(date +%H:%M:%S)"
