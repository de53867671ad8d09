#!/bin/bash
# Chain 8 (after the THIRD workspace reset, Aug 19): chains 5-7 were queued
# or running when the reset wiped /tmp and runs/ — their deliverables never
# landed.  This chain replays them in contention-aware order for the 1-core
# host:
#   A. On-chip benches FIRST (quiet host, models_demo only): serve-dtype
#      ladder at the serving decode config (decides the int8 policy after
#      the quant-matmul no-copy fix), on-chip stage breakdowns, streaming
#      depth sweep, serving replay, full bench.py.
#   B. CPU lifter dataset caches (serial; ~4 min each measured).
#   C. Panoptic residual legs 1-4 rebuild (checkpoints were wiped; legs 1-3
#      reproduce r2e, leg 4 is the new scaling-curve point) + r2f evals
#      incl. the extreme-spread 2.1 robustness row.
#   D. Wide-training-distribution A/B: fresh runs/pan_wide24 (spread
#      0.8-2.4) vs pan_res on dense/wide/extreme evals.
# Idempotent via runs/.chain8 sentinels; logs tee'd into tracked
# reports/chain8_logs/ so a reset cannot lose results again.
#
# Usage: nohup bash scripts/relay_chain8.sh >> /tmp/chain8.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain8
LOGD=reports/chain8_logs
mkdir -p $SENT runs/cache reports $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

KNOBS="--residual-prior --prior median --loss huber --min-cam-dist 1.2"

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

# ---- wait for the relay ---------------------------------------------------
PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

# ---- A: quiet-host on-chip benches (chain6 + chain7 deliverables) ---------
stage dec2_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec2_int8 1800 python scripts/bench_serve_dtype.py --dtype int8 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec2_fp32 1800 python scripts/bench_serve_dtype.py --dtype fp32 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage int8_check2 1800 python scripts/check_int8_onchip.py
stage breakdown_serving 1800 python scripts/bench_stage_breakdown.py
stage breakdown_stress 1800 python scripts/bench_stage_breakdown.py \
  --threshold 0.05 --decode-top-k 0
stage depth_sweep2 1800 python scripts/bench_stream_depth.py

if [ ! -e "$SENT/serve_replay2.done" ]; then
  stage replay_rec 1800 python -m mpe3d_tpu generate-synthetic \
    --output runs/replay_recording.json --frames 120 --seed 5 \
    --tm /root/reference/tm_panoptic.pickle
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
log "benches complete"

# ---- B: CPU dataset caches (serial — 1-core host) -------------------------
stage cache_pan1 21600 python scripts/train_lifter_big.py --out runs/pan_res \
  --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.0 \
  --prior-dropout 0.15 --seed-base 1000
stage cache_pan2 21600 python scripts/train_lifter_big.py --out runs/pan_res \
  --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.0 \
  --prior-dropout 0.15 --seed-base 2000
stage cache_pan3 21600 python scripts/train_lifter_big.py --out runs/pan_res \
  --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.0 \
  --prior-dropout 0.15 --seed-base 3000
stage cache_pan4 21600 python scripts/train_lifter_big.py --out runs/pan_res \
  --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.0 \
  --prior-dropout 0.15 --seed-base 4000
stage cache_w24_1 21600 python scripts/train_lifter_big.py --out runs/pan_wide24 \
  --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.4 \
  --prior-dropout 0.15 --seed-base 1000
stage cache_w24_2 21600 python scripts/train_lifter_big.py --out runs/pan_wide24 \
  --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.4 \
  --prior-dropout 0.15 --seed-base 2000
log "cache builds complete"

# ---- C: Panoptic residual legs 1-4 + r2f evals ----------------------------
stage pan_leg1 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 1000
stage pan_leg2 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 2000 --resume
stage pan_leg3 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 3000 --resume
stage pan_leg4 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 4000 --resume

if [ -e runs/pan_res/pose_estimator.npz ]; then
  mkdir -p runs/eval_res
  cp models_demo/widefield/skeleton_matching.* runs/eval_res/
  cp runs/pan_res/pose_estimator.* runs/eval_res/
  stage eval_dense4 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2f.json
  stage eval_wide4 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2f.json
  stage eval_extreme 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 2.1 --out reports/panoptic_residual_extreme_r2f.json
  stage diag_prior4 2400 python scripts/diag_lifter_prior.py \
    --env PANOPTIC --lifter runs/pan_res \
    --out reports/panoptic_residual_prior_diag_r2f.json
fi

# ---- D: wide-training-distribution A/B ------------------------------------
stage w24_leg1 16200 python scripts/train_lifter_big.py --out runs/pan_wide24 \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.4 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 1000
stage w24_leg2 16200 python scripts/train_lifter_big.py --out runs/pan_wide24 \
  --cache-dir runs/cache $KNOBS --spread 0.8,2.4 --prior-dropout 0.15 \
  --ema 0.999 --seed-base 2000 --resume
if [ -e runs/pan_wide24/pose_estimator.npz ]; then
  mkdir -p runs/eval_w24
  cp models_demo/widefield/skeleton_matching.* runs/eval_w24/
  cp runs/pan_wide24/pose_estimator.* runs/eval_w24/
  stage w24_dense 3600 python scripts/eval_synthetic.py --models runs/eval_w24 \
    --seed 30 --spread 1.2 --out reports/panoptic_wide24_dense.json
  stage w24_wide 3600 python scripts/eval_synthetic.py --models runs/eval_w24 \
    --seed 30 --spread 1.8 --out reports/panoptic_wide24_wide.json
  stage w24_extreme 3600 python scripts/eval_synthetic.py --models runs/eval_w24 \
    --seed 30 --spread 2.1 --out reports/panoptic_wide24_extreme.json
fi

log "CHAIN8 ALL DONE"
