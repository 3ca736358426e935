#!/bin/bash
# Package the round-3 fine-tune winners and rebuild the derived artifacts.
# Usage: scripts/package_round3.sh [l2_dir] [e2_dir] [l3_dir]
# Defaults are the p70 rehearsal runs (photo uplift with zero procedural
# regression, /tmp/fleet/p70_*_eval.log). Each arg may be "skip".
set -eu
cd "$(dirname "$0")/.."
CKPT=srs_tpu/models/checkpoints
L2=${1:-/tmp/p70_l2}
E2=${2:-/tmp/p70_e2}
L3=${3:-/tmp/p70_l3}

pkg() {  # src_dir name
  local src=$1/$2
  if [ "$1" = "skip" ] || [ ! -d "$src" ]; then echo "== skip $2"; return; fi
  rm -rf "$CKPT/$2"
  cp -r "$src" "$CKPT/$2"
  echo "== packaged $2 from $1"
}

pkg "$L2" edsr_l_x2
pkg "$E2" espcn_x2
pkg "$L3" edsr_l_x3

# Rebuild the derived artifacts against the new members.
python scripts/reeval.py --only edsr_l_x2,espcn_x2,edsr_l_x3
python scripts/fit_fusion.py --scales 2,3
python scripts/photo_eval.py --models "espcn,edsr_l,edsr_l+,edsr_l:ibp,fusion,zssr" | tail -12
echo "PACKAGE DONE"
