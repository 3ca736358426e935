#!/bin/bash
# Round-4c: extended training for the headline tiers (40k -> 100k total;
# round-2 measured +1.1 dB procedural for edsr_l from the same
# extension, and the xl tier holds fine-tune rehearsal at almost no
# procedural cost: base 38.13 -> ft 38.09). Then re-fine-tune p70 from
# the extended bases and re-run the held-out panel. Runs AFTER
# round4_fleet.sh (one TPU owner at a time).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fleet4c
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

# --- extend bases 60k more steps (warm start from the 40k bases) ------
stage xl2_ext 4800 python scripts/pretrain.py /tmp/r4_base --only edsr_xl_x2 --steps 60000 --mix v3 --init-from /tmp/r4_base
stage xl3_ext 4800 python scripts/pretrain.py /tmp/r4_base --only edsr_xl_x3 --steps 60000 --mix v3 --init-from /tmp/r4_base
stage xl4_ext 4800 python scripts/pretrain.py /tmp/r4_base --only edsr_xl_x4 --steps 60000 --mix v3 --init-from /tmp/r4_base
stage l2_ext  4800 python scripts/pretrain.py /tmp/r4_base --only edsr_l_x2 --steps 60000 --mix v3 --init-from /tmp/r4_base
stage l3_ext  4800 python scripts/pretrain.py /tmp/r4_base --only edsr_l_x3 --steps 60000 --mix v3 --init-from /tmp/r4_base

# --- re-fine-tune p70 from the extended bases -------------------------
stage xl2_p70b 2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_xl_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage xl3_p70b 2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_xl_x3 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage xl4_p70b 2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_xl_x4 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage l2_p70b  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_l_x2 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base
stage l3_p70b  2400 python scripts/pretrain.py /tmp/r4_p70 --only edsr_l_x3 --steps 6000 --mix p70 --lr 5e-5 --init-from /tmp/r4_base

# --- final panels over the extended candidates -------------------------
stage panel2 3600 python scripts/photo_eval.py --scale 2 --models espcn,edsr_l,edsr_l+,edsr_xl,edsr_xl+,edsr_xl:ibp --checkpoint-dir /tmp/r4_p70
stage panel3 3600 python scripts/photo_eval.py --scale 3 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir /tmp/r4_p70
stage panel4 3600 python scripts/photo_eval.py --scale 4 --models edsr_l,edsr_xl,edsr_xl+ --checkpoint-dir /tmp/r4_p70

echo "ROUND4C FLEET DONE $(date +%H:%M:%S)"
