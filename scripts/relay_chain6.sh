#!/bin/bash
# Chain 6 (fires after relay_chain5.sh prints CHAIN5 ALL DONE).
#
# 1. Re-measure the serving dtype ladder after the quant-matmul no-copy
#    fix (the per-frame zeros().at[].set() on every weight matrix was a
#    ~26 MB/frame HBM copy — chain4 measured int8 at 499 us vs bf16
#    268 us WITH the copies; this run decides whether int8 can win).
# 2. Clean-host repeats of the latency benches that chain4 ran under
#    CPU contention (chain5's cache builds): depth sweep, serve replay,
#    full bench.py — these become the quoted RESULTS numbers.
# Idempotent via runs/.chain6 sentinels; logs in tracked reports/.
#
# Usage: nohup bash scripts/relay_chain6.sh >> /tmp/chain6.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain6
LOGD=reports/chain6_logs
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

until grep -q "CHAIN5 ALL DONE" /tmp/chain5.log 2>/dev/null; do
  sleep 120
done
log "CHAIN5 DONE"
sleep 30   # let the host quiesce

stage dec2_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec2_int8 1800 python scripts/bench_serve_dtype.py --dtype int8 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec2_fp32 1800 python scripts/bench_serve_dtype.py --dtype fp32 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage int8_check2 1800 python scripts/check_int8_onchip.py

stage depth_sweep2 1800 python scripts/bench_stream_depth.py

if [ ! -e "$SENT/serve_replay2.done" ]; then
  if [ ! -e runs/replay_recording.json ]; then
    timeout 1800 python -m mpe3d_tpu generate-synthetic \
      --output runs/replay_recording.json --frames 120 --seed 5 \
      --tm /root/reference/tm_panoptic.pickle > "$LOGD/replay_rec.log" 2>&1
  fi
  if timeout 2400 python scripts/serve_replay.py --spawn \
      "--modelsdir models_demo/widefield --backend triangulation --warmup --depth 8 --tm /root/reference/tm_panoptic.pickle" \
      runs/replay_recording.json > reports/serve_replay_tpu_r2b.json \
      2> "$LOGD/serve_replay2.log"; then
    touch $SENT/serve_replay2.done; log "done serve_replay2"
  else
    log "FAIL serve_replay2 (log $LOGD/serve_replay2.log)"
  fi
fi

stage bench_full2 3600 python bench.py

log "CHAIN6 ALL DONE"
