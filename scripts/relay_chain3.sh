#!/bin/bash
# Third chain (fires after relay_chain2.sh prints CHAIN2 ALL DONE).
#
# 1. matcher_base: the missing control for the ablation table — identical
#    training budget to the drop/residual/bce variants (limit 20000,
#    160 epochs) with the reference's shipped hyperparameters, then
#    re-run the composite eval over all four + the demo checkpoint.
# 2. Volume curve midpoint: dense/wide rows exist at spread 1.2/1.8 —
#    add 1.5 for the robustness curve.
set -u
cd /root/repo
SENT=runs/.chain3
mkdir -p $SENT reports
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

stage() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$SENT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  if timeout "$tmo" "$@" > "/tmp/chain3_$name.log" 2>&1; then
    touch "$SENT/$name.done"; log "done $name"
  else
    log "FAIL $name (rc=$?, log /tmp/chain3_$name.log) — continuing"
    return 1
  fi
}

until grep -q "CHAIN2 ALL DONE" /tmp/chain2.log 2>/dev/null; do
  sleep 120
done
log "CHAIN2 DONE"

stage matcher_base 10800 python scripts/train_matcher_big.py \
  --out runs/matcher_base --limit 20000 --epochs 160
stage matcher_variants2 7200 python scripts/eval_matcher_composite.py \
  --matchers models_demo runs/matcher_base runs/matcher_drop \
  runs/matcher_residual runs/matcher_bce \
  --out reports/matcher_variants_r2.json

stage eval_mid 3600 python scripts/eval_synthetic.py --models runs/eval_res \
  --seed 30 --spread 1.5 --out reports/panoptic_residual_mid_r2d.json

log "CHAIN3 ALL DONE"
