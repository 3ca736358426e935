#!/bin/bash
# Round-5 stage D: ARK 128px acceptance after packaging (VERDICT r4 #3).
# Run AFTER the 128px generator is packaged (the builder copies
# .r5/ark128/ark_gen_x1 + ark_meta.json into srs_tpu/models/checkpoints
# when ark128_eval gates: class accuracy >= 0.70 and >= the packaged
# 64px model's 0.594).
#   - eval_ark against the PACKAGED checkpoint (writes EVAL.json)
#   - generated-2K naturalness with the refine A/B (gen2k_niqe{,_refined})
#   - steady-state 2K generate latency, refine off/on (BENCH_LOCAL rows)
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

# NR null model for the print-acceptability verdict (VERDICT r4 weak #1):
# the mosaic bench showed brisque_delta +38.6 on a real-photo input — if
# an artifact-free (but soft) BICUBIC 84 MP output scores comparably
# high, the elevation is what the NR scale says about ANY 9.6x-magnified
# content (scale transfer), not net artifacts; if bicubic reads natural,
# the net output carries real artifacts to hunt.
stage bench_mosaic_bicubic 5400 env SRS_BENCH_INPUT=mosaic \
  SRS_BENCH_PROVIDER=bicubic python bench.py

stage ark_pkg_eval 3600 python scripts/eval_ark.py
stage gen2k_ab 5400 python scripts/gen_quality.py --refine --crops 4
stage gen2k_latency 3600 python - <<'EOF'
import json, time
from srs_tpu.models.generate import ARKImageGenerator, ARKImageConfig
from srs_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
for refine in (False, True):
    extra = {"refine": True} if refine else {}
    g = ARKImageGenerator(config=ARKImageConfig(size="2K", extra=extra))
    g.generate("a macro photo of a flower")  # warm compile
    t0 = time.time(); g.generate("a studio photo of a watch"); dt = time.time() - t0
    print(json.dumps({"metric": "ark_generate_2k", "refine": refine,
                      "seconds": round(dt, 2)}), flush=True)
EOF

echo "ROUND5C FLEET DONE $(date +%H:%M:%S)"
