#!/bin/bash
# Chain 8c: quiet-host follow-ups after chain8b's dtype-ladder re-runs.
#   1. diag_stream: isolate why bench.py's stream figure collapsed to
#      ~single-dispatch time in chain4+chain8 while the standalone depth
#      sweep measured 4.1 ms in the same sessions (trained matcher vs
#      measurement ordering — scripts/diag_stream_bench.py docstring).
#   2. bench_full3: the reordered bench.py (stream measured first,
#      best-of-3) on a quiet host — validates the fix.
#   3. export-servable the final pan_res lifter into models_demo/pan_res
#      (int8, ~29 MB) so the next workspace reset cannot erase the trained
#      headline model again.
# Usage: nohup bash scripts/relay_chain8c.sh >> /tmp/chain8c.log 2>&1 &
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
until grep -q "CHAIN8B ALL DONE" /tmp/chain8b.log 2>/dev/null; do sleep 120; done
log "CHAIN8B DONE"
sleep 30
stage diag_stream 3600 python scripts/diag_stream_bench.py
stage bench_full3 3600 python bench.py
if [ -e runs/pan_res/pose_estimator.npz ]; then
  stage export_panres 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/pan_res --out models_demo/pan_res
  # the export copies the matcher from --modelsdir; pan_res has none, so
  # pair it with the demo matcher for a self-contained directory
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json models_demo/pan_res/ \
     2>/dev/null || true
fi
log "CHAIN8C ALL DONE"
