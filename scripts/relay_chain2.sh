#!/bin/bash
# Follow-up chain (round 2, after relay_chain.sh prints ALL STAGES DONE).
#
# 1. Rerun the prior-diagnosis with the corrected --lifter path (the main
#    chain's invocation pointed at the checkpoint stem, not the run dir).
# 2. Measure the dense-one-hot device-decode rewrite on-chip: the old
#    scatter-based loop body put the exact-decode config at ~3.4 ms/frame
#    (dtype-invariant — decode-bound); A/B both decode configs and the
#    serve-dtype ladder at the serving default decode.
# 3. Rerun the serving replay bench with the readiness-gated client (the
#    first run charged ~a minute of server cold-start to the frames).
# 4. Extra quality legs on fresh frames: Panoptic leg 3 (seed 3000) and
#    ARPLAB leg 2 (seed 2000), each followed by the standard evals.
# 5. One fresh bench.py line for RESULTS.md.
#
# Idempotent via runs/.chain2 sentinels, same pattern as relay_chain.sh.
set -u
cd /root/repo
SENT=runs/.chain2
mkdir -p $SENT reports
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -e "$SENT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  if timeout "$tmo" "$@" > "/tmp/chain2_$name.log" 2>&1; then
    touch "$SENT/$name.done"; log "done $name"
  else
    log "FAIL $name (rc=$?, log /tmp/chain2_$name.log) — continuing"
    return 1
  fi
}

# ---- wait for the main chain ------------------------------------------
until grep -q "ALL STAGES DONE" /tmp/chain.log 2>/dev/null; do
  sleep 120
done
log "MAIN CHAIN DONE"

LIFTER_KNOBS="--residual-prior --prior median --loss huber --spread 0.8,2.0 --min-cam-dist 1.2"

# ---- 1: corrected prior diagnosis -------------------------------------
stage diag_prior2 2400 python scripts/diag_lifter_prior.py \
  --env PANOPTIC --lifter runs/pan_res \
  --out reports/panoptic_residual_prior_diag_r2b.json

# ---- 2: decode rewrite + dtype ladder on-chip -------------------------
# decode-stress config (exact decode, low threshold): before the rewrite
# this measured 3390/3435/3410 us for fp32/bf16/int8
stage dec_stress_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 0 --threshold 0.05
# serving-default decode: the dtype ladder should now be visible
stage dec_def_fp32 1800 python scripts/bench_serve_dtype.py --dtype fp32 \
  --decode-top-k 64 --threshold 0.5
stage dec_def_bf16 1800 python scripts/bench_serve_dtype.py --dtype bf16 \
  --decode-top-k 64 --threshold 0.5
stage dec_def_int8 1800 python scripts/bench_serve_dtype.py --dtype int8 \
  --decode-top-k 64 --threshold 0.5

# ---- 3: honest serving replay (readiness-gated client, warm jit cache) --
if [ ! -e "$SENT/serve_replay2.done" ]; then
  if timeout 2400 python scripts/serve_replay.py --spawn \
      "--modelsdir models_demo/widefield --backend triangulation --warmup --depth 8 --tm /root/reference/tm_panoptic.pickle" \
      runs/replay_recording.json > runs/serve_replay_tpu2.json \
      2> /tmp/chain2_serve_replay.log; then
    touch $SENT/serve_replay2.done; log "done serve_replay2"
    cp runs/serve_replay_tpu2.json reports/serve_replay_tpu_r2.json
  else
    log "FAIL serve_replay2 (log /tmp/chain2_serve_replay.log)"
  fi
fi

# ---- 4: extra quality legs on fresh frames ----------------------------
stage pan_leg3 16200 python scripts/train_lifter_big.py --out runs/pan_res \
  --cache-dir runs/cache $LIFTER_KNOBS --prior-dropout 0.15 --ema 0.999 \
  --seed-base 3000 --resume
if [ -e "$SENT/pan_leg3.done" ]; then
  cp runs/pan_res/pose_estimator.* runs/eval_res/
  stage eval_dense3 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.2 --out reports/panoptic_residual_dense_r2d.json
  stage eval_wide3 3600 python scripts/eval_synthetic.py --models runs/eval_res \
    --seed 30 --spread 1.8 --out reports/panoptic_residual_wide_r2d.json
fi

stage arp_leg2 16200 python scripts/train_lifter_big.py --out runs/arp_res \
  --cache-dir runs/cache --env ARPLAB $LIFTER_KNOBS --ema 0.999 \
  --seed-base 2000 --resume
if [ -e "$SENT/arp_leg2.done" ]; then
  stage eval_arp2 3600 python scripts/eval_arplab.py \
    --matcher models_demo/arplab --lifter runs/arp_res \
    --out reports/arplab_residual_clean_r2c.json
fi

# ---- 5: fresh bench line ----------------------------------------------
stage bench_full 3600 python bench.py

log "CHAIN2 ALL DONE"
