#!/bin/bash
# Chain 16 (queued behind chain15, Aug 19): IRLS adjudication rows.
#
# Honesty rows for the IRLS extension (RESULTS.md shoot-out section):
#   A. ARPLAB classical backend with --tri-variant irls (clean + 7%
#      outliers): the "beats DLT" claim should be measured against the
#      BEST classical solve we ship, not only the reference-exact
#      median pair filter.  If IRLS-DLT closes on (or beats) the MLP's
#      15.14 mm, that changes the ARP narrative — measure it either way
#      (the IRLS-prior lifter from chain15 is the counter-move).
#   B. Panoptic wide (spread 1.8) --tri-variant irls — chain14 covers
#      dense/extreme/outlier only.
#   C. IRLS-prior lifter at extreme spread (2.1) with and without
#      --prior-gate 8: does the better prior move the prior-quality
#      bound, and does the gate stay a no-op/win on top of it?
# Idempotent via runs/.chain16 sentinels; logs in reports/chain16_logs/.
#
# Usage: nohup bash scripts/relay_chain16.sh >> /tmp/chain16.log 2>&1 &
#        echo $! > /tmp/chain16.pid
set -u
cd /root/repo
SENT=runs/.chain16
LOGD=reports/chain16_logs
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

# ---- wait for chain15 ---------------------------------------------------------
C15PID=$(cat /tmp/chain15.pid 2>/dev/null || echo "")
while [ -n "$C15PID" ] && kill -0 "$C15PID" 2>/dev/null; do
  log "chain15 (pid $C15PID) still running; sleeping 300s"
  sleep 300
done
log "chain15 finished — starting chain16"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

# ---- A: ARPLAB IRLS classical backend ------------------------------------------
ARP="python scripts/eval_arplab.py --matcher models_demo/arplab --lifter runs/arp_res"
stage arp_irlstri_clean 5400 $ARP --tri-variant irls \
  --out reports/arplab_irlstri_clean_r2m.json
stage arp_irlstri_outlier 5400 $ARP --tri-variant irls --outlier-rate 0.07 \
  --out reports/arplab_irlstri_outlier_r2m.json

# ---- B: Panoptic wide IRLS backend ----------------------------------------------
EVP="python scripts/eval_synthetic.py --models runs/eval_res"
stage pan_wide_irlstri 5400 $EVP --seed 30 --spread 1.8 --tri-variant irls \
  --out reports/panoptic_wide_irlstri_r2m.json

# ---- C: IRLS-prior lifter + prior gate (extreme plain row is chain15's) ---------
if [ -e runs/eval_irls/pose_estimator.npz ]; then
  EVI="python scripts/eval_synthetic.py --models runs/eval_irls"
  stage irls_extreme_gate 5400 $EVI --seed 30 --spread 2.1 --prior-gate 8 \
    --out reports/panoptic_irls_extreme_gate_r2m.json
  stage irls_wide_gate 5400 $EVI --seed 30 --spread 1.8 --prior-gate 8 \
    --out reports/panoptic_irls_wide_gate_r2m.json
fi

log "CHAIN16 ALL DONE"
