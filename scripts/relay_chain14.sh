#!/bin/bash
# Chain 14 (queued behind chain13, Aug 19): adjudicate the MEDIAN prior-gate
# statistic on the Panoptic pipeline.
#
# Chain11 measured the old masked-MEAN gate statistic HURTING in the gate's
# own designed regime (outlier_rate 0.07: gated 16.55 mm vs ungated
# 13.55 mm) — one confident outlier detection inflates the mean residual of
# a perfectly good median-filtered prior and fires the gate.  The fix
# (lifting/pack.py) swaps the statistic for the masked MEDIAN.  This chain
# re-measures the three gate rows with the median statistic:
#   A. outlier A/B (seed 31, outlier_rate 0.07) — the fix's target: gated
#      must now track the ungated 13.55 mm.
#   B. dense + wide gate rows (seed 30) — the in-distribution no-op
#      property must survive the statistic change (mean-gate rows were
#      17.51/64.67 vs plain 17.48/64.20, chain11 r2h).
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

OUTL="--pixel-sigma 1.5 --cam-dropout 0.05 --joint-dropout 0.05 --spurious-rate 0.1 --outlier-rate 0.07"

# ---- A: outlier A/B with the median gate --------------------------------------
stage eval_outlier_medgate 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 31 --spread 1.2 $OUTL --prior-gate 8 \
  --out reports/panoptic_outlier_medgate_r2j.json

# ---- B: in-distribution no-op check --------------------------------------------
stage eval_dense_medgate 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 30 --spread 1.2 --prior-gate 8 \
  --out reports/panoptic_dense_medgate_r2j.json
stage eval_wide_medgate 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 30 --spread 1.8 --prior-gate 8 \
  --out reports/panoptic_wide_medgate_r2j.json

log "CHAIN14 ALL DONE"
