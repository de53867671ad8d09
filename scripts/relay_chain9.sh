#!/bin/bash
# Chain 9 (after the FOURTH workspace reset, Aug 19 ~07:30): chain8 finished
# benches, caches, and pan_res legs 1-4 (dense 17.53 mm / wide 65.1 mm were
# committed), but the reset wiped runs/ before the extreme eval, the
# export-servable, the wide24 A/B, and the queued chain8b/c/d/e watchers
# ran.  This chain replays the lot in contention-aware order for the 1-core
# host:
#   A. Post-fix benches FIRST on the quiet host (models_demo only):
#      reordered bench.py (validates the weight-residency fix — chain8's
#      bench_full2 measured the 190 ms collapse BEFORE the fix landed),
#      diag_stream_bench, the fused-MLP kernel A/B (decides the
#      use_fused_mlp TPU default), and the serve replays (fixed + batched).
#   B. CPU lifter dataset caches (serial).
#   C. pan_res legs 1-4 rebuild + r2f evals incl. the missing extreme row
#      + prior diag, then export-servable into models_demo/pan_res so the
#      next reset cannot erase the headline model again (COMMIT it).
#   D. Wide-training-distribution A/B (runs/pan_wide24) + evals.
#   E. dec2 serve-dtype ladder re-runs (chain8b's quiet-host verification).
# Idempotent via runs/.chain9 sentinels; logs tee'd into tracked
# reports/chain9_logs/.
#
# Usage: nohup bash scripts/relay_chain9.sh >> /tmp/chain9.log 2>&1 &
set -u
cd /root/repo
SENT=runs/.chain9
LOGD=reports/chain9_logs
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

# ---- A: quiet-host post-fix benches ---------------------------------------
stage bench_full4 3600 python bench.py
stage diag_stream 3600 python scripts/diag_stream_bench.py
stage fusedmlp_ab 3600 python scripts/bench_fused_mlp.py

stage replay_rec 1800 python -m mpe3d_tpu generate-synthetic \
  --output runs/replay_recording.json --frames 120 --seed 5 \
  --tm /root/reference/tm_panoptic.pickle
run_replay() {  # run_replay <name> <extra server args...>
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
log "benches complete"

# ---- B: CPU dataset caches (serial — 1-core host) -------------------------
for SB in 1000 2000 3000 4000; do
  stage cache_pan$SB 21600 python scripts/train_lifter_big.py --out runs/pan_res \
    --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.0 \
    --prior-dropout 0.15 --seed-base $SB
done
for SB in 1000 2000; do
  stage cache_w24_$SB 21600 python scripts/train_lifter_big.py --out runs/pan_wide24 \
    --cpu --build-cache-only --cache-dir runs/cache $KNOBS --spread 0.8,2.4 \
    --prior-dropout 0.15 --seed-base $SB
done
log "cache builds complete"

# ---- C: pan_res legs 1-4 + r2f evals + servable export --------------------
RES=""
for SB in 1000 2000 3000 4000; do
  stage pan_leg$SB 16200 python scripts/train_lifter_big.py --out runs/pan_res \
    --cache-dir runs/cache $KNOBS --spread 0.8,2.0 --prior-dropout 0.15 \
    --ema 0.999 --seed-base $SB $RES
  RES="--resume"
done

if [ -e runs/pan_res/pose_estimator.npz ]; then
  mkdir -p runs/eval_res
  cp models_demo/widefield/skeleton_matching.* runs/eval_res/
  cp runs/pan_res/pose_estimator.* runs/eval_res/
  stage eval_dense9 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2g.json
  stage eval_wide9 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2g.json
  stage eval_extreme9 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 2.1 --out reports/panoptic_residual_extreme_r2g.json
  stage diag_prior9 2400 python scripts/diag_lifter_prior.py \
    --env PANOPTIC --lifter runs/pan_res \
    --out reports/panoptic_residual_prior_diag_r2g.json
  stage export_panres 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/pan_res --out models_demo/pan_res
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json models_demo/pan_res/ \
     2>/dev/null || true
  log "pan_res exported to models_demo/pan_res — COMMIT IT"
fi

# ---- D: wide-training-distribution A/B ------------------------------------
RES=""
for SB in 1000 2000; do
  stage w24_leg$SB 16200 python scripts/train_lifter_big.py --out runs/pan_wide24 \
    --cache-dir runs/cache $KNOBS --spread 0.8,2.4 --prior-dropout 0.15 \
    --ema 0.999 --seed-base $SB $RES
  RES="--resume"
done
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

# ---- E: dec2 serve-dtype ladder re-verification (chain8b) ------------------
stage dec3_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec3_int8 1800 python scripts/bench_serve_dtype.py --dtype int8 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield
stage dec3_fp32 1800 python scripts/bench_serve_dtype.py --dtype fp32 \
  --decode-top-k 64 --threshold 0.5 --modelsdir models_demo/widefield

log "CHAIN9 ALL DONE"
