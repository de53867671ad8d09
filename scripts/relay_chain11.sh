#!/bin/bash
# Chain 11 (Aug 19, after chain10): prior-gate pipeline adjudication +
# quality-curve continuation + servable refreshes.
#   A. CPU dataset caches: pan seeds 7000/8000, arp seed 3000.
#   B. Finish the gated r2h eval set (the first run died on a relay
#      FAILED_PRECONDITION mid-chain): wide + dense with --prior-gate 8.
#   C. Prior-gate outlier A/B — the gate's designed use case (heavy-tailed
#      confident detector outliers, full camera visibility): dense scenes
#      with --outlier-rate 0.07, gate off vs on.  The spread-2.1 result
#      already measured (121.1 vs 119.5 mm: few-view depth-ambiguous
#      priors reproject self-consistently, invisible to the gate).
#   D. arp_res leg 3 (--resume) + re-eval + re-export models_demo/arplab.
#   E. pan_res legs 7-8 (--resume) + r2i dense/wide evals + export the
#      refreshed servable into models_demo/pan_res (currently the stale
#      4-leg checkpoint; 6-leg is already better) — COMMIT both exports.
# Idempotent via runs/.chain11 sentinels; logs in reports/chain11_logs/.
#
# Usage: nohup bash scripts/relay_chain11.sh >> /tmp/chain11.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain11
LOGD=reports/chain11_logs
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

KNOBS="--residual-prior --prior median --loss huber --min-cam-dist 1.2 --spread 0.8,2.0 --prior-dropout 0.15"

# ---- A: CPU dataset caches (serial — 1-core host) ---------------------------
for SB in 7000 8000; do
  stage cache_pan$SB 21600 python scripts/train_lifter_big.py --out runs/pan_res \
    --cpu --build-cache-only --cache-dir runs/cache $KNOBS --seed-base $SB
done
stage cache_arp3000 21600 python scripts/train_lifter_big.py --out runs/arp_res \
  --cpu --build-cache-only --cache-dir runs/cache --env ARPLAB $KNOBS \
  --seed-base 3000
log "cache builds complete"

# ---- relay wait --------------------------------------------------------------
PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

# ---- B: finish the gated r2h eval set (6-leg checkpoint in runs/eval_res) ----
stage eval_wide_gate 5400 python scripts/eval_synthetic.py --models runs/eval_res \
  --seed 30 --spread 1.8 --prior-gate 8 \
  --out reports/panoptic_residual_wide_gate_r2h.json
stage eval_dense_gate 5400 python scripts/eval_synthetic.py --models runs/eval_res \
  --seed 30 --spread 1.2 --prior-gate 8 \
  --out reports/panoptic_residual_dense_gate_r2h.json

# ---- C: outlier A/B (the gate's designed regime) -----------------------------
stage eval_outlier_plain 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 31 --spread 1.2 --outlier-rate 0.07 \
  --out reports/panoptic_outlier_plain_r2i.json
stage eval_outlier_gate 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 31 --spread 1.2 --outlier-rate 0.07 \
  --prior-gate 8 --out reports/panoptic_outlier_gate_r2i.json

# ---- D: arp_res leg 3 + re-eval + re-export ----------------------------------
stage arp_leg3000 16200 python scripts/train_lifter_big.py --out runs/arp_res \
  --cache-dir runs/cache --env ARPLAB $KNOBS --ema 0.999 --seed-base 3000 --resume
if [ -e runs/arp_res/pose_estimator.npz ]; then
  stage arp_clean11 3600 python scripts/eval_arplab.py \
    --matcher models_demo/arplab --lifter runs/arp_res \
    --out reports/arplab_residual_clean_r2i.json
  stage export_arp11 1800 python -m mpe3d_tpu export-servable --rig ARPLAB \
    --modelsdir runs/arp_res --out models_demo/arplab
  log "arp_res leg-3 exported to models_demo/arplab — compare r2i vs r2h, COMMIT if >="
fi

# ---- E: pan_res legs 7-8 + r2i evals + servable refresh ----------------------
for SB in 7000 8000; do
  stage pan_leg$SB 16200 python scripts/train_lifter_big.py --out runs/pan_res \
    --cache-dir runs/cache $KNOBS --ema 0.999 --seed-base $SB --resume
done
if [ -e runs/pan_res/pose_estimator.npz ]; then
  mkdir -p runs/eval_res
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json runs/eval_res/
  cp runs/pan_res/pose_estimator.npz runs/pan_res/pose_estimator.json \
     runs/eval_res/
  stage eval_dense11 5400 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2i.json
  stage eval_wide11 5400 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2i.json
  stage export_panres11 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/pan_res --out models_demo/pan_res
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json models_demo/pan_res/ \
     2>/dev/null || true
  log "pan_res 8-leg exported to models_demo/pan_res — compare r2i vs r2h, COMMIT if >="
fi

log "CHAIN11 ALL DONE"
