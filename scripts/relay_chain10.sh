#!/bin/bash
# Chain 10 (queued behind chain9, Aug 19): completes the second rig's
# shipping story and extends the Panoptic quality curve.
#   A. ARPLAB lifter dataset caches (CPU) + pan_res leg-5/6 caches.
#   B. ARPLAB residual-prior lifter rebuild (2 legs, prior-dropout 0.15 +
#      EMA — the post-reset runs/arp_res was wiped; RESULTS.md table rows
#      came from it) → eval_arplab + prior diag (r2h reports) →
#      export-servable into models_demo/arplab so BOTH reference
#      environments ship end-to-end model pairs.
#   C. pan_res legs 5-6 (--resume from the 4-leg consolidated checkpoint)
#      + r2h evals — does the dense/wide curve keep scaling?
#      (export decision is manual, after comparing with the r2g rows.)
# Idempotent via runs/.chain10 sentinels; logs in reports/chain10_logs/.
#
# Usage: nohup bash scripts/relay_chain10.sh >> /tmp/chain10.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain10
LOGD=reports/chain10_logs
mkdir -p $SENT runs/cache reports $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

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

# ---- wait for chain9 to release the host + device --------------------------
C9PID=$(cat /tmp/chain9.pid 2>/dev/null || echo "")
while [ -n "$C9PID" ] && kill -0 "$C9PID" 2>/dev/null; do
  log "chain9 (pid $C9PID) still running; sleeping 300s"
  sleep 300
done
log "chain9 finished — starting chain10"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

KNOBS="--residual-prior --prior median --loss huber --min-cam-dist 1.2 --spread 0.8,2.0 --prior-dropout 0.15"

# ---- A: CPU dataset caches (serial — 1-core host) ---------------------------
for SB in 1000 2000; do
  stage cache_arp$SB 21600 python scripts/train_lifter_big.py --out runs/arp_res \
    --cpu --build-cache-only --cache-dir runs/cache --env ARPLAB $KNOBS \
    --seed-base $SB
done
for SB in 5000 6000; do
  stage cache_pan$SB 21600 python scripts/train_lifter_big.py --out runs/pan_res \
    --cpu --build-cache-only --cache-dir runs/cache $KNOBS --seed-base $SB
done
log "cache builds complete"

# ---- B: ARPLAB residual-prior lifter + evals + servable export --------------
RES=""
for SB in 1000 2000; do
  stage arp_leg$SB 16200 python scripts/train_lifter_big.py --out runs/arp_res \
    --cache-dir runs/cache --env ARPLAB $KNOBS --ema 0.999 --seed-base $SB $RES
  RES="--resume"
done

if [ -e runs/arp_res/pose_estimator.npz ]; then
  stage arp_clean10 3600 python scripts/eval_arplab.py \
    --matcher models_demo/arplab --lifter runs/arp_res \
    --out reports/arplab_residual_clean_r2h.json
  stage arp_diag10 2400 python scripts/diag_lifter_prior.py --env ARPLAB \
    --lifter runs/arp_res --out reports/arplab_residual_prior_diag_r2h.json
  cp models_demo/arplab/skeleton_matching.npz \
     models_demo/arplab/skeleton_matching.json runs/arp_res/ 2>/dev/null || true
  stage export_arp 1800 python -m mpe3d_tpu export-servable --rig ARPLAB \
    --modelsdir runs/arp_res --out models_demo/arplab
  log "arp_res exported to models_demo/arplab — COMMIT IT"
fi

# ---- C: pan_res legs 5-6 + r2h evals ----------------------------------------
for SB in 5000 6000; do
  stage pan_leg$SB 16200 python scripts/train_lifter_big.py --out runs/pan_res \
    --cache-dir runs/cache $KNOBS --ema 0.999 --seed-base $SB --resume
done
if [ -e runs/pan_res/pose_estimator.npz ]; then
  mkdir -p runs/eval_res
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json runs/eval_res/
  cp runs/pan_res/pose_estimator.npz runs/pan_res/pose_estimator.json \
     runs/eval_res/
  stage eval_dense10 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2h.json
  stage eval_wide10 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2h.json
  stage eval_extreme10 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 2.1 --out reports/panoptic_residual_extreme_r2h.json
fi

log "CHAIN10 ALL DONE"
