#!/bin/bash
# Chain 17 (queued behind chain16): corrected compact-vs-full latency A/B.
#
# chain13's lat_compact ran before the bench_serve_dtype fix that loads
# the LIFTER checkpoint from --modelsdir (it timed the default 29.1 M
# init for both dirs — served_weight_mb 63.03 in the log gives it away).
# Re-measure both sides with real weights in fresh processes.
set -u
cd /root/repo
SENT=runs/.chain17
LOGD=reports/chain17_logs
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

C16PID=$(cat /tmp/chain16.pid 2>/dev/null || echo "")
while [ -n "$C16PID" ] && kill -0 "$C16PID" 2>/dev/null; do
  log "chain16 (pid $C16PID) still running; sleeping 300s"
  sleep 300
done
log "chain16 finished — starting chain17"

PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

LAT="python scripts/bench_serve_dtype.py --dtype bf16 --decode-top-k 64 --threshold 0.5"
stage lat_compact_fixed 1800 $LAT --modelsdir runs/eval_compact
stage lat_reference_fixed 1800 $LAT --modelsdir runs/eval_res

log "CHAIN17 ALL DONE"
