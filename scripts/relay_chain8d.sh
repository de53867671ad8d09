#!/bin/bash
# Chain 8d: on-chip A/B of the whole-network pallas MLP serving kernel
# (ops/fused_mlp.py) vs the existing bf16/int8 paths, on the quiet host
# after chain8c.  Decision input for flipping pipeline.use_fused_mlp's
# TPU default and revisiting the int8 serving policy.
# Usage: nohup bash scripts/relay_chain8d.sh >> /tmp/chain8d.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain8
LOGD=reports/chain8_logs
mkdir -p $SENT $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }
stage() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$SENT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  if timeout "$tmo" "$@" > "$LOGD/$name.log" 2>&1; then
    touch "$SENT/$name.done"; log "done $name"
  else
    log "FAIL $name (rc=$?, log $LOGD/$name.log) — continuing"
  fi
}
until grep -q "CHAIN8C ALL DONE" /tmp/chain8c.log 2>/dev/null; do sleep 120; done
log "CHAIN8C DONE"
sleep 30
stage fusedmlp_ab 3600 python scripts/bench_fused_mlp.py
log "CHAIN8D ALL DONE"
