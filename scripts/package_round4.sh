#!/bin/bash
# Package the round-4 clean-lineage winners (trained on the 14-source
# pool with EVAL_HOLDOUT_SOURCES withheld) and rebuild derived artifacts.
#
# Usage: scripts/package_round4.sh [names...]
#   names default: the full headline set. Each name is copied from its
#   source dir (p70 fine-tune where one exists, else the v3 base).
# Runs on the TPU (reeval + fusion fit + panel): one TPU owner at a time.
set -eu
cd "$(dirname "$0")/.."
CKPT=srs_tpu/models/checkpoints
P70=${R4_P70:-/root/repo/.r4/p70}
BASE=${R4_BASE:-/root/repo/.r4/base}

NAMES=${*:-edsr_xl_x2 edsr_xl_x3 edsr_xl_x4 edsr_l_x2 edsr_l_x3 espcn_x2 edsr_l_robust_x2 edsr_l_robust_x3}

pkg() {  # name
  local src
  if [ -d "$P70/$1" ]; then src=$P70/$1; elif [ -d "$BASE/$1" ]; then src=$BASE/$1; else
    echo "== MISSING $1 (neither $P70 nor $BASE has it)"; return 1; fi
  rm -rf "$CKPT/$1"
  cp -r "$src" "$CKPT/$1"
  # carry the trainer's EVAL entry (mix/init_from/photo metadata) across
  python - "$1" "$(dirname "$src")" <<'PY'
import json, sys
name, srcdir = sys.argv[1], sys.argv[2]
src = json.load(open(f"{srcdir}/EVAL.json"))
dst_path = "srs_tpu/models/checkpoints/EVAL.json"
dst = json.load(open(dst_path))
if name in src:
    dst[name] = src[name]
    json.dump(dst, open(dst_path, "w"), indent=1, sort_keys=True)
PY
  echo "== packaged $1 from $src"
}

for n in $NAMES; do pkg "$n"; done

# Derived artifacts against the new members.
python scripts/reeval.py --only "$(echo "$NAMES" | tr ' ' ',')"
python scripts/fit_fusion.py --scales 2,3,4 --members edsr_xl,edsr_l,rcan,edsr_m,espcn,bicubic
# (zssr runs 4 per-image fine-tunes at panel width — it moved to the
# round4d bench fleet as its own bounded stage)
python scripts/photo_eval.py --scale 2 --models "espcn,edsr_l,edsr_xl,edsr_xl+,edsr_xl:ibp,fusion" | tail -12
echo "PACKAGE ROUND4 DONE"
