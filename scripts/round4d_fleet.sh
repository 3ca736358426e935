#!/bin/bash
# Round-4d: benches + acceptance after packaging and the default flip.
# Runs AFTER package_round4.sh (one TPU owner at a time).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet4d
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

# Headline bench on the flipped default (routed_model should be edsr_xl).
stage bench_default 3600 python bench.py

# Real-photo-mosaic input: separates "render_photo isn't natural enough
# for the calibrated NR scale" from "the calibration is tight"
# (VERDICT r3 #3).
stage bench_mosaic 3600 env SRS_BENCH_INPUT=mosaic python bench.py

# Conv-level MFU A/B (VERDICT r3 #7): tile block 1024 vs the default 512
# at fixed batch.
stage bench_block1024 3600 env SRS_BENCH_BLOCK=1024 python bench.py

# Whole-pipeline procedural quality panel with the new default tier.
stage quality_panel 3600 python scripts/quality_bench.py --n 4 --size 512

# Degradation-routing acceptance on the packaged tiers (noise panel).
stage panel_robust 2400 python scripts/photo_eval.py --scale 2 --models edsr_xl,edsr_l_robust --degrade noise

# zssr-from-prior on the held-out panel (4 per-image fine-tunes; bounded
# here rather than inside the packaging script).
stage panel_zssr 3600 python scripts/photo_eval.py --scale 2 --models zssr

echo "ROUND4D FLEET DONE $(date +%H:%M:%S)"
