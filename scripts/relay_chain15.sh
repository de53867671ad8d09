#!/bin/bash
# Chain 15 (queued behind chain14, Aug 19): IRLS-prior lifter rebuilds.
#
# The packed-prior shoot-out (scripts/diag_triangulators.py,
# reports/triangulator_diag{,_arp}.json) measured the Huber-IRLS all-view
# triangulation beating the shipping median-filtered prior in EVERY
# regime: Panoptic clean spread 2.1 6.6 vs 12.5 mm, 7% outliers p95 10.9
# vs 24.2; ARP clean 13.4 vs 13.8, outliers 18.1 vs 21.6.  The residual
# head degrades with its prior (the measured prior-quality bound), so a
# better prior should move the pipeline rows — especially wide/extreme
# and the ARP prior-present ceiling (14.0 mm = the old median prior).
#   A. CPU caches with --prior irls (cache suffix keys on the prior).
#   B. 4 Panoptic legs -> runs/pan_irls; 3 ARP legs -> runs/arp_irls
#      (same knobs as pan_res/arp_res otherwise: residual head, huber,
#      prior-dropout 0.15, EMA 0.999, fresh seeds per leg).
#   C. evals: pan dense/wide/extreme/outlier; ARP clean/outlier —
#      directly comparable to the chain14 r2k rows.
#   D. exports to models_demo/{pan_irls,arp_irls} if B/C complete.
# Idempotent via runs/.chain15 sentinels; logs in reports/chain15_logs/.
#
# Usage: nohup bash scripts/relay_chain15.sh >> /tmp/chain15.log 2>&1 &
#        echo $! > /tmp/chain15.pid
set -u
cd /root/repo
SENT=runs/.chain15
LOGD=reports/chain15_logs
mkdir -p $SENT reports $LOGD
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

# ---- wait for chain14 ---------------------------------------------------------
C14PID=$(cat /tmp/chain14.pid 2>/dev/null || echo "")
while [ -n "$C14PID" ] && kill -0 "$C14PID" 2>/dev/null; do
  log "chain14 (pid $C14PID) still running; sleeping 300s"
  sleep 300
done
log "chain14 finished — starting chain15"

KNOBS="--residual-prior --prior irls --loss huber --min-cam-dist 1.2 --spread 0.8,2.0 --prior-dropout 0.15"

# ---- A: CPU dataset caches (serial — 1-core host) ------------------------------
for SB in 1000 2000 3000 4000; do
  stage cache_pani$SB 21600 python scripts/train_lifter_big.py \
    --out runs/pan_irls --cpu --build-cache-only --cache-dir runs/cache \
    $KNOBS --seed-base $SB
done
for SB in 1000 2000 3000; do
  stage cache_arpi$SB 21600 python scripts/train_lifter_big.py \
    --out runs/arp_irls --cpu --build-cache-only --cache-dir runs/cache \
    --env ARPLAB $KNOBS --seed-base $SB
done
log "cache builds complete"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

# ---- B: training legs ----------------------------------------------------------
RES=""
for SB in 1000 2000 3000 4000; do
  stage pani_leg$SB 16200 python scripts/train_lifter_big.py \
    --out runs/pan_irls --cache-dir runs/cache $KNOBS --ema 0.999 \
    --seed-base $SB $RES
  RES="--resume"
done
RES=""
for SB in 1000 2000 3000; do
  stage arpi_leg$SB 16200 python scripts/train_lifter_big.py \
    --out runs/arp_irls --cache-dir runs/cache --env ARPLAB $KNOBS \
    --ema 0.999 --seed-base $SB $RES
  RES="--resume"
done

# ---- C: evals -------------------------------------------------------------------
if [ -e runs/pan_irls/pose_estimator.npz ]; then
  mkdir -p runs/eval_irls
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json runs/eval_irls/
  cp runs/pan_irls/pose_estimator.npz runs/pan_irls/pose_estimator.json \
     runs/eval_irls/
  EV="python scripts/eval_synthetic.py --models runs/eval_irls"
  stage eval_irls_dense 5400 $EV --seed 30 --spread 1.2 \
    --out reports/panoptic_irls_dense_r2l.json
  stage eval_irls_wide 5400 $EV --seed 30 --spread 1.8 \
    --out reports/panoptic_irls_wide_r2l.json
  stage eval_irls_extreme 5400 $EV --seed 30 --spread 2.1 \
    --out reports/panoptic_irls_extreme_r2l.json
  stage eval_irls_outlier 5400 $EV --seed 31 --spread 1.2 \
    --outlier-rate 0.07 --out reports/panoptic_irls_outlier_r2l.json
fi
if [ -e runs/arp_irls/pose_estimator.npz ]; then
  ARP="python scripts/eval_arplab.py --matcher models_demo/arplab --lifter runs/arp_irls"
  stage eval_arpi_clean 5400 $ARP \
    --out reports/arplab_irls_clean_r2l.json
  stage eval_arpi_outlier 5400 $ARP --outlier-rate 0.07 \
    --out reports/arplab_irls_outlier_r2l.json
fi

# ---- D: exports ------------------------------------------------------------------
if [ -e "$SENT/eval_irls_dense.done" ]; then
  stage export_pan_irls 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/eval_irls --out models_demo/pan_irls
fi
if [ -e "$SENT/eval_arpi_clean.done" ]; then
  mkdir -p runs/eval_arpi
  cp models_demo/arplab/skeleton_matching.npz \
     models_demo/arplab/skeleton_matching.json runs/eval_arpi/ 2>/dev/null
  cp runs/arp_irls/pose_estimator.npz runs/arp_irls/pose_estimator.json \
     runs/eval_arpi/
  stage export_arp_irls 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/eval_arpi --out models_demo/arp_irls
fi

log "CHAIN15 ALL DONE"
