#!/bin/bash
# Chain 7 (fires after relay_chain6.sh prints CHAIN6 ALL DONE):
# on-chip per-stage breakdown of the fused frame program (matcher /
# +decode / +lift) at the serving decode config and the stress config.
set -u
cd /root/repo
SENT=runs/.chain7
LOGD=reports/chain7_logs
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
until grep -q "CHAIN6 ALL DONE" /tmp/chain6.log 2>/dev/null; do sleep 120; done
log "CHAIN6 DONE"
stage breakdown_serving 1800 python scripts/bench_stage_breakdown.py
stage breakdown_stress 1800 python scripts/bench_stage_breakdown.py \
  --threshold 0.05 --decode-top-k 0
log "CHAIN7 ALL DONE"
