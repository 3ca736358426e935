#!/bin/bash
# Round-5 stage E: the round5b leftovers.
#   - routed_panel: retry (first attempt died on a transient TPU backend
#     error mid-fetch, .r5/log/routed_panel.log)
#   - quality_panel: re-run (first attempt predates the load_panel import
#     fix in quality_bench.py)
#   - bench_ensemble_staged / bench_fusion_staged: the VALID wall-time
#     cost rows for the quality alternatives. The round5b rows are
#     invalid (the fully-traced 8-pass programs OOM'd HBM and the
#     degradation ladder served bicubic while the row kept the
#     ensemble/fusion label — see BENCH_LOCAL 2026-08-19). Multi-pass
#     providers now run dispatch-staged (pipeline._staged_multipass) and
#     rows carry provider_used/degraded, so these rows adjudicate
#     VERDICT r4 #6 for real.
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

stage routed_panel 3600 python scripts/routed_panel.py
stage quality_panel 3600 python scripts/quality_bench.py --n 4 --size 512
stage bench_ensemble_staged 5400 env SRS_BENCH_ENSEMBLE=1 python bench.py
stage bench_fusion_staged 5400 env SRS_BENCH_PROVIDER=fusion python bench.py

echo "ROUND5D FLEET DONE $(date +%H:%M:%S)"
