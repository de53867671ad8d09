#!/bin/bash
# Chain 14 v2 (queued behind chain13, Aug 19): eval-protocol correction +
# median-gate adjudication + IRLS classical-backend rows.
#
# Three things changed since the r2i rows were measured:
#   1. eval_synthetic.py now reads the PRIOR VARIANT from the checkpoint
#      meta (before, every Panoptic pipeline eval packed the default MEAN
#      prior under the median-prior-trained pan_res — a train/infer input
#      mismatch; eval_arplab always did it right).  All Panoptic rows are
#      re-measured under the fixed protocol → *_r2k reports.
#   2. The prior gate's statistic is now the masked MEDIAN (chain11 caught
#      the mean statistic hurting in the outlier regime: 16.55 vs 13.55 mm
#      ungated).  Gate rows re-measured.
#   3. geometry/triangulate.py grew triangulate_irls (Huber-IRLS all-view
#      solve) — measure it as the classical backend (--tri-variant irls)
#      on the dense and extreme brackets vs the reference-exact median.
# Idempotent via runs/.chain14 sentinels; logs in reports/chain14_logs/.
#
# Usage: nohup bash scripts/relay_chain14.sh >> /tmp/chain14.log 2>&1 &
#        echo $! > /tmp/chain14.pid
set -u
cd /root/repo
SENT=runs/.chain14
LOGD=reports/chain14_logs
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

# ---- wait for chain13 ---------------------------------------------------------
C13PID=$(cat /tmp/chain13.pid 2>/dev/null || echo "")
while [ -n "$C13PID" ] && kill -0 "$C13PID" 2>/dev/null; do
  log "chain13 (pid $C13PID) still running; sleeping 300s"
  sleep 300
done
log "chain13 finished — starting chain14"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

EV="python scripts/eval_synthetic.py --models runs/eval_res"
OUTL="--outlier-rate 0.07"

# ---- A: corrected-protocol plain rows (prior from meta) -----------------------
stage eval_dense_plain 5400 $EV --seed 30 --spread 1.2 \
  --out reports/panoptic_dense_plain_r2k.json
stage eval_wide_plain 5400 $EV --seed 30 --spread 1.8 \
  --out reports/panoptic_wide_plain_r2k.json
stage eval_extreme_plain 5400 $EV --seed 30 --spread 2.1 \
  --out reports/panoptic_extreme_plain_r2k.json
stage eval_outlier_plain 5400 $EV --seed 31 --spread 1.2 $OUTL \
  --out reports/panoptic_outlier_plain_r2k.json

# ---- B: median-gate adjudication ----------------------------------------------
stage eval_outlier_medgate 5400 $EV --seed 31 --spread 1.2 $OUTL \
  --prior-gate 8 --out reports/panoptic_outlier_medgate_r2k.json
stage eval_dense_medgate 5400 $EV --seed 30 --spread 1.2 --prior-gate 8 \
  --out reports/panoptic_dense_medgate_r2k.json
stage eval_wide_medgate 5400 $EV --seed 30 --spread 1.8 --prior-gate 8 \
  --out reports/panoptic_wide_medgate_r2k.json

# ---- C: IRLS classical backend ------------------------------------------------
stage eval_dense_irlstri 5400 $EV --seed 30 --spread 1.2 --tri-variant irls \
  --out reports/panoptic_dense_irlstri_r2k.json
stage eval_extreme_irlstri 5400 $EV --seed 30 --spread 2.1 --tri-variant irls \
  --out reports/panoptic_extreme_irlstri_r2k.json
stage eval_outlier_irlstri 5400 $EV --seed 31 --spread 1.2 $OUTL \
  --tri-variant irls --out reports/panoptic_outlier_irlstri_r2k.json

log "CHAIN14 ALL DONE"
