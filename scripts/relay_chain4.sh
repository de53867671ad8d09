#!/bin/bash
# Round-2 rebuild chain #4 (after the second workspace reset, Aug 18 ~20:30 UTC).
#
# The reset wiped /tmp and runs/ again: chain1/chain2 reports that were
# committed survive, but the checkpoints (runs/pan_res, runs/arp_res,
# runs/matcher_*), the chain sentinels, and chain3 (never fired) are gone.
# This chain restores the checkpoints and delivers the still-missing items:
#   A. matcher ablation with the budget-matched base control
#      (reports/matcher_variants_r2.json) — chain3's main deliverable;
#   B. Panoptic residual lifter legs 1-3 (seeds 1000/2000/3000) + a NEW
#      volume-curve midpoint eval (spread 1.5) + dense/wide/diag/int8 evals
#      on the final checkpoint (r2e suffix);
#   C. ARPLAB residual legs 1-2 + eval (arplab_residual_clean_r2c.json);
#   D. serve-dtype ladder at the serving-default decode, streaming depth
#      sweep, serving replay, full bench.py — outputs tee'd into
#      reports/chain4_logs/ so a reset cannot lose them again.
# Idempotent via runs/.chain4 sentinels.  TPU starts on the matcher
# ablation immediately while the lifter dataset caches build on CPU.
#
# Usage: nohup bash scripts/relay_chain4.sh >> /tmp/chain4.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain4
LOGD=reports/chain4_logs
mkdir -p $SENT runs/cache reports $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

CACHE_LOCK=/tmp/mpe3d_cache.lock
LIFTER_KNOBS="--residual-prior --prior median --loss huber --spread 0.8,2.0 --min-cam-dist 1.2"

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

# ---- CPU dataset caches, serialised, in the background -------------------
cache_build() {  # cache_build <sentname> <extra args...>
  local name=$1; shift
  [ -e "$SENT/$name.done" ] && return 0
  flock $CACHE_LOCK timeout 21600 python scripts/train_lifter_big.py \
    --cpu --build-cache-only --cache-dir runs/cache "$@" \
    > "$LOGD/$name.log" 2>&1 && touch "$SENT/$name.done"
}
(
  cache_build cache_pan1 --out runs/pan_res $LIFTER_KNOBS --prior-dropout 0.15 --seed-base 1000
  cache_build cache_pan2 --out runs/pan_res $LIFTER_KNOBS --prior-dropout 0.15 --seed-base 2000
  cache_build cache_pan3 --out runs/pan_res $LIFTER_KNOBS --prior-dropout 0.15 --seed-base 3000
  cache_build cache_arp1 --out runs/arp_res --env ARPLAB $LIFTER_KNOBS --seed-base 1000
  cache_build cache_arp2 --out runs/arp_res --env ARPLAB $LIFTER_KNOBS --seed-base 2000
  log "cache builds complete"
) &
CACHEPID=$!

# ---- wait for the relay ---------------------------------------------------
PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
  log "relay still down; sleeping 240s"
  sleep 240
done
log "RELAY UP"

# ---- A: matcher ablation (TPU work that needs no lifter cache) ------------
for v in base drop residual bce; do
  case $v in
    base)     FLAGS="";;
    drop)     FLAGS="--feat-drop 0.1 --attn-drop 0.1";;
    residual) FLAGS="--residual";;
    bce)      FLAGS="--bce";;
  esac
  stage matcher_$v 10800 python scripts/train_matcher_big.py \
    --out runs/matcher_$v --limit 20000 --epochs 160 $FLAGS
done
MATCHERS="models_demo"
for v in base drop residual bce; do
  [ -e runs/matcher_$v/skeleton_matching.npz ] && MATCHERS="$MATCHERS runs/matcher_$v"
done
stage matcher_variants 7200 python scripts/eval_matcher_composite.py \
  --matchers $MATCHERS --out reports/matcher_variants_r2.json

# ---- B: Panoptic residual lifter, legs 1-3 --------------------------------
stage pan_leg1 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $LIFTER_KNOBS --prior-dropout 0.15 --ema 0.999 \
  --seed-base 1000
stage pan_leg2 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $LIFTER_KNOBS --prior-dropout 0.15 --ema 0.999 \
  --seed-base 2000 --resume
stage pan_leg3 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $LIFTER_KNOBS --prior-dropout 0.15 --ema 0.999 \
  --seed-base 3000 --resume

if [ -e runs/pan_res/pose_estimator.npz ]; then
  mkdir -p runs/eval_res
  cp models_demo/widefield/skeleton_matching.* runs/eval_res/
  cp runs/pan_res/pose_estimator.* runs/eval_res/
  stage eval_dense 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2e.json
  stage eval_mid 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.5 --out reports/panoptic_residual_mid_r2e.json
  stage eval_wide 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2e.json
  stage diag_prior 2400 python scripts/diag_lifter_prior.py \
    --env PANOPTIC --lifter runs/pan_res \
    --out reports/panoptic_residual_prior_diag_r2e.json
  stage eval_int8 3600 python scripts/eval_serve_int8.py --models runs/eval_res \
    --cpu --out reports/serve_int8_residual_r2e.json
fi

# ---- C: ARPLAB residual lifter, legs 1-2 ----------------------------------
stage arp_leg1 16200 python scripts/train_lifter_big.py --out runs/arp_res \
  --cache-dir runs/cache --env ARPLAB $LIFTER_KNOBS --ema 0.999 --seed-base 1000
stage arp_leg2 16200 python scripts/train_lifter_big.py --out runs/arp_res \
  --cache-dir runs/cache --env ARPLAB $LIFTER_KNOBS --ema 0.999 \
  --seed-base 2000 --resume
if [ -e runs/arp_res/pose_estimator.npz ]; then
  stage eval_arp 3600 python scripts/eval_arplab.py \
    --matcher models_demo/arplab --lifter runs/arp_res \
    --out reports/arplab_residual_clean_r2c.json
fi

# ---- D: on-chip serving/latency benches -----------------------------------
stage int8_check 1800 python scripts/check_int8_onchip.py
stage dec_def_fp32 1800 python scripts/bench_serve_dtype.py --dtype fp32 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec_def_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec_def_int8 1800 python scripts/bench_serve_dtype.py --dtype int8 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec_stress_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 0 --threshold 0.05 --modelsdir models_demo/widefield
stage depth_sweep 1800 python scripts/bench_stream_depth.py

if [ ! -e "$SENT/serve_replay.done" ]; then
  stage replay_rec 1800 python -m mpe3d_tpu generate-synthetic \
    --output runs/replay_recording.json --frames 120 --seed 5 \
    --tm /root/reference/tm_panoptic.pickle
  if timeout 2400 python scripts/serve_replay.py --spawn \
      "--modelsdir models_demo/widefield --backend triangulation --warmup --depth 8 --tm /root/reference/tm_panoptic.pickle" \
      runs/replay_recording.json > reports/serve_replay_tpu_r2.json \
      2> "$LOGD/serve_replay.log"; then
    touch $SENT/serve_replay.done; log "done serve_replay"
  else
    log "FAIL serve_replay (log $LOGD/serve_replay.log)"
  fi
fi

stage bench_full 3600 python bench.py

wait $CACHEPID 2>/dev/null
log "CHAIN4 ALL DONE"
