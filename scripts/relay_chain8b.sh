#!/bin/bash
# Chain 8b: quiet-host re-runs of the serve-dtype ladder stages that ran
# while a pytest suite was still competing for the single host CPU (their
# sentinels were cleared; chain8's sequential pass had already moved on).
# The contaminated bf16 run even produced a negative chained differential.
# Fires after chain8 completes; stage() skips anything already re-done.
# Usage: nohup bash scripts/relay_chain8b.sh >> /tmp/chain8b.log 2>&1 &
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
until grep -q "CHAIN8 ALL DONE" /tmp/chain8.log 2>/dev/null; do sleep 180; done
log "CHAIN8 DONE"
sleep 30
stage dec2_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec2_int8 1800 python scripts/bench_serve_dtype.py --dtype int8 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec2_fp32 1800 python scripts/bench_serve_dtype.py --dtype fp32 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
log "CHAIN8B ALL DONE"
