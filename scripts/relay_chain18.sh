#!/bin/bash
# Chain 18 (queued behind chain17): fused-MLP kernel A/B on the COMPACT
# lifter.  The full-width A/B (chain9) kept XLA for bf16; the compact
# model's layers are smaller (more launch-overhead-dominated per layer,
# fewer bytes to stream), so the single-launch kernel's trade-offs
# shift — measure before assuming the full-width verdict transfers.
set -u
cd /root/repo
SENT=runs/.chain18
LOGD=reports/chain18_logs
mkdir -p $SENT reports $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

stage() {
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

C17PID=$(cat /tmp/chain17.pid 2>/dev/null || echo "")
while [ -n "$C17PID" ] && kill -0 "$C17PID" 2>/dev/null; do
  log "chain17 (pid $C17PID) still running; sleeping 300s"
  sleep 300
done
log "chain17 finished — starting chain18"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

stage fusedmlp_compact 2400 python scripts/bench_fused_mlp.py \
  --modelsdir runs/eval_compact

log "CHAIN18 ALL DONE"
