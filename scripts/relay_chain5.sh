#!/bin/bash
# Chain 5 (fires after relay_chain4.sh prints CHAIN4 ALL DONE).
#
# 1. Panoptic residual leg 4 (seed 4000) — the scaling curve
#    18.1 → 17.86 → 17.70 mm is flattening but still monotone; measure
#    one more point (r2f evals).
# 2. Training-distribution experiment for the WIDE regime: the wide-scene
#    row (66 mm at eval spread 1.8) is the weakest quality axis.  Train a
#    fresh 2-leg lifter on spread 0.8-2.4 (people up to the dome edge,
#    min-cam-dist 1.2 still resamples camera-adjacent placements) and
#    A/B it against pan_res on dense (1.2), wide (1.8), and extreme (2.1)
#    evals.  If covering the eval regime in training moves 66 mm
#    materially, that becomes the recommended recipe.
# 3. Extreme-spread (2.1) robustness row for the headline model too.
# Idempotent via runs/.chain5 sentinels; outputs all under reports/.
#
# Usage: nohup bash scripts/relay_chain5.sh >> /tmp/chain5.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain5
LOGD=reports/chain5_logs
mkdir -p $SENT runs/cache reports $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

CACHE_LOCK=/tmp/mpe3d_cache.lock
KNOBS="--residual-prior --prior median --loss huber --min-cam-dist 1.2"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -e "$SENT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  if timeout "$tmo" "$@" > "$LOGD/$name.log" 2>&1; then
    touch "$SENT/$name.done"; log "done $name"
  else
    log "FAIL $name (rc=$?, log $LOGD/$name.log) — continuing"
    return 1
  fi
}

# cache builds can start immediately (CPU, serialised on the shared lock
# with chain4's builders)
(
  for sb in 1000 2000; do
    n=cache_w24_$sb
    [ -e "$SENT/$n.done" ] && continue
    flock $CACHE_LOCK timeout 21600 python scripts/train_lifter_big.py \
      --out runs/pan_wide24 --cpu --build-cache-only --cache-dir runs/cache \
      $KNOBS --spread 0.8,2.4 --prior-dropout 0.15 --seed-base $sb \
      > "$LOGD/$n.log" 2>&1 && touch "$SENT/$n.done"
  done
  n=cache_pan4
  if [ ! -e "$SENT/$n.done" ]; then
    flock $CACHE_LOCK timeout 21600 python scripts/train_lifter_big.py \
      --out runs/pan_res --cpu --build-cache-only --cache-dir runs/cache \
      $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 --seed-base 4000 \
      > "$LOGD/$n.log" 2>&1 && touch "$SENT/$n.done"
  fi
  log "chain5 cache builds complete"
) &
CACHEPID=$!

until grep -q "CHAIN4 ALL DONE" /tmp/chain4.log 2>/dev/null; do
  sleep 180
done
log "CHAIN4 DONE"

# ---- 1: pan leg 4 + r2f evals -------------------------------------------
stage pan_leg4 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 4000 --resume
if [ -e "$SENT/pan_leg4.done" ] && [ -e runs/pan_res/pose_estimator.npz ]; then
  mkdir -p runs/eval_res
  cp models_demo/widefield/skeleton_matching.* runs/eval_res/
  cp runs/pan_res/pose_estimator.* runs/eval_res/
  stage eval_dense4 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2f.json
  stage eval_wide4 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2f.json
fi
# extreme-spread robustness row for the headline model (whatever leg is live)
if [ -e runs/eval_res/pose_estimator.npz ]; then
  stage eval_extreme 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 2.1 --out reports/panoptic_residual_extreme_r2f.json
fi

# ---- 2: wide-distribution experiment (fresh model, 2 legs) ---------------
stage w24_leg1 16200 python scripts/train_lifter_big.py --out runs/pan_wide24 \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.4 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 1000
stage w24_leg2 16200 python scripts/train_lifter_big.py --out runs/pan_wide24 \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.4 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 2000 --resume
if [ -e runs/pan_wide24/pose_estimator.npz ]; then
  mkdir -p runs/eval_w24
  cp models_demo/widefield/skeleton_matching.* runs/eval_w24/
  cp runs/pan_wide24/pose_estimator.* runs/eval_w24/
  stage w24_dense 3600 python scripts/eval_synthetic.py --models runs/eval_w24 \
    --seed 30 --spread 1.2 --out reports/panoptic_wide24_dense.json
  stage w24_wide 3600 python scripts/eval_synthetic.py --models runs/eval_w24 \
    --seed 30 --spread 1.8 --out reports/panoptic_wide24_wide.json
  stage w24_extreme 3600 python scripts/eval_synthetic.py --models runs/eval_w24 \
    --seed 30 --spread 2.1 --out reports/panoptic_wide24_extreme.json
fi

wait $CACHEPID 2>/dev/null
log "CHAIN5 ALL DONE"
