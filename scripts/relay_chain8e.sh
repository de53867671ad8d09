#!/bin/bash
# Chain 8e: post-fix serving replays on the quiet host, after chain8d.
#   1. replay_fixed: the chain8 serve replay repeated with the
#      weight-residency fix in place (was 6.9 fps / p50 1.23 s when every
#      dispatch re-uploaded the numpy weight tree).
#   2. replay_batched: same recording through --batch-window 16 — the
#      micro-batcher's relay-level win (N frames per round trip).
# Usage: nohup bash scripts/relay_chain8e.sh >> /tmp/chain8e.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain8
LOGD=reports/chain8_logs
mkdir -p $SENT $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }
until grep -q "CHAIN8D ALL DONE" /tmp/chain8d.log 2>/dev/null; do sleep 120; done
log "CHAIN8D DONE"
sleep 30
if [ ! -e runs/replay_recording.json ]; then
  timeout 1800 python -m mpe3d_tpu generate-synthetic \
    --output runs/replay_recording.json --frames 120 --seed 5 \
    --tm /root/reference/tm_panoptic.pickle > "$LOGD/replay_rec2.log" 2>&1
fi
run_replay() {  # run_replay <name> <extra server args>
  local name=$1; shift
  if [ -e "$SENT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name"
  if timeout 2400 python scripts/serve_replay.py --spawn \
      "--modelsdir models_demo/widefield --backend triangulation --warmup --depth 8 --tm /root/reference/tm_panoptic.pickle $*" \
      runs/replay_recording.json > "reports/$name.json" \
      2> "$LOGD/$name.log"; then
    touch "$SENT/$name.done"; log "done $name: $(cat reports/$name.json)"
  else
    log "FAIL $name (log $LOGD/$name.log)"
  fi
}
run_replay serve_replay_fixed
run_replay serve_replay_batched --batch-window 16 --batch-linger-ms 5
log "CHAIN8E ALL DONE"
