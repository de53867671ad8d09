#!/bin/bash
# Chain 12 (queued behind chain11, Aug 19): parity-table completion +
# robustness refresh on the rebuilt checkpoints.
#   A. "Projected 2D input" analog row (reference README.md:35:
#      17.84 mm / 96.23 / 97.76): clean GT projections — pixel-sigma 0,
#      no ghosts/dropout — through the full pipeline.  With no ghost
#      skeletons the wire-protocol GT-duplication artifact vanishes, so
#      the raw-protocol mAP becomes directly comparable.
#   B. Same protocol at the reference-like sparser density (spread 2.5 is
#      OOD for the lifter; use 1.8 wide as the harder bracket).
#   C. ARPLAB robustness rows re-measured on the chain11 3-leg arp_res
#      (the RESULTS sweep table used the older checkpoint): sigma 3 / 5,
#      cam-dropout 0.3, outliers 7%.
# Idempotent via runs/.chain12 sentinels; logs in reports/chain12_logs/.
#
# Usage: nohup bash scripts/relay_chain12.sh >> /tmp/chain12.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain12
LOGD=reports/chain12_logs
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

# ---- wait for chain11 to release the host + device --------------------------
C11PID=$(cat /tmp/chain11.pid 2>/dev/null || echo "")
while [ -n "$C11PID" ] && kill -0 "$C11PID" 2>/dev/null; do
  log "chain11 (pid $C11PID) still running; sleeping 300s"
  sleep 300
done
log "chain11 finished — starting chain12"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

# ---- A/B: projected-2D parity rows (8-leg eval_res from chain11) -------------
CLEAN="--pixel-sigma 0 --cam-dropout 0 --joint-dropout 0 --spurious-rate 0"
stage eval_projected_dense 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 30 --spread 1.2 $CLEAN \
  --out reports/panoptic_projected_dense_r2i.json
stage eval_projected_wide 5400 python scripts/eval_synthetic.py \
  --models runs/eval_res --seed 30 --spread 1.8 $CLEAN \
  --out reports/panoptic_projected_wide_r2i.json

# ---- C: ARPLAB robustness rows on the rebuilt arp_res ------------------------
ARP="python scripts/eval_arplab.py --matcher models_demo/arplab --lifter runs/arp_res"
stage arp_sigma3 3600 $ARP --pixel-sigma 3 \
  --out reports/arplab_res_sigma3_r2i.json
stage arp_sigma5 3600 $ARP --pixel-sigma 5 \
  --out reports/arplab_res_sigma5_r2i.json
stage arp_camdrop 3600 $ARP --cam-dropout 0.3 \
  --out reports/arplab_res_camdrop_r2i.json
stage arp_outlier 3600 $ARP --outlier-rate 0.07 \
  --out reports/arplab_res_outlier_r2i.json
stage arp_outlier_gate 3600 $ARP --outlier-rate 0.07 --prior-gate 8 \
  --out reports/arplab_res_outlier_gate_r2i.json

log "CHAIN12 ALL DONE"
