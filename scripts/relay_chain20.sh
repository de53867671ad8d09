#!/bin/bash
# Chain 20 (Aug 20): chain19's phase 2/3 restructured to BANK VALUE PER
# LEG.  chain19 trained all 7 IRLS-prior legs (4 pan + 3 arp, ~85 min
# each) before any export/eval — a second environment reset mid-phase-2
# would again lose everything (runs/ is gitignored and was wiped twice).
# Here every leg is followed immediately by a servable export into
# models_demo/ (committed, survives resets) — bf16 (bit-identical to
# TPU serving) + int8 — and a mid-chain dense eval lands after pan leg
# 2 so at least one quality row exists early.  Full eval rows run at
# the end as before.
#
# Phases 0/1 live in chain19 (done; sentinels runs/.chain19).  This
# chain reuses the SAME sentinel dir so re-runs stay idempotent.
# Usage: nohup bash scripts/relay_chain20.sh >> /tmp/chain20.log 2>&1 &
#        echo $! > /tmp/chain20.pid
set -u
cd /root/repo
SENT=runs/.chain19
LOGD=reports/chain19_logs
mkdir -p $SENT reports $LOGD runs
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

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

wait_relay() {
  local PROBE='import jax, jax.numpy as jnp; print("RELAY_OK", float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))'
  until timeout 240 python -c "$PROBE" 2>/dev/null | grep -q RELAY_OK; do
    log "relay still down; sleeping 240s"
    sleep 240
  done
  log "RELAY UP"
}

# refresh the staging dir for an export: matcher from a committed export,
# lifter from the freshest training checkpoint
prep_eval_dir() {  # prep_eval_dir <dst> <matcher_src> <lifter_run>
  mkdir -p "$1"
  cp "$2"/skeleton_matching.npz "$2"/skeleton_matching.json "$1"/
  cp "$3"/pose_estimator.npz "$3"/pose_estimator.json "$1"/
}

# per-leg banking: overwrite the committed servable exports (no sentinel —
# ALWAYS re-export after a new leg so models_demo tracks the best lifter)
bank_pan() {
  [ -e runs/pan_irls/pose_estimator.npz ] || return 0
  prep_eval_dir runs/eval_irls models_demo/widefield runs/pan_irls
  log "bank pan_irls exports (post-leg $1)"
  timeout 1800 python -m mpe3d_tpu export-servable --modelsdir runs/eval_irls \
    --dtype bf16 --out models_demo/pan_irls_bf16 \
    > "$LOGD/bank_pan_bf16_$1.log" 2>&1 || log "bank pan bf16 FAIL (leg $1)"
  timeout 1800 python -m mpe3d_tpu export-servable --modelsdir runs/eval_irls \
    --out models_demo/pan_irls \
    > "$LOGD/bank_pan_i8_$1.log" 2>&1 || log "bank pan int8 FAIL (leg $1)"
}
bank_arp() {
  [ -e runs/arp_irls/pose_estimator.npz ] || return 0
  prep_eval_dir runs/eval_arpi models_demo/arplab runs/arp_irls
  log "bank arp_irls exports (post-leg $1)"
  timeout 1800 python -m mpe3d_tpu export-servable --modelsdir runs/eval_arpi \
    --rig ARPLAB --dtype bf16 --out models_demo/arp_irls_bf16 \
    > "$LOGD/bank_arp_bf16_$1.log" 2>&1 || log "bank arp bf16 FAIL (leg $1)"
  timeout 1800 python -m mpe3d_tpu export-servable --modelsdir runs/eval_arpi \
    --rig ARPLAB --out models_demo/arp_irls \
    > "$LOGD/bank_arp_i8_$1.log" 2>&1 || log "bank arp int8 FAIL (leg $1)"
}

# ---- gates: caches prebuilt + the foreground matcher A/B benches drained ----
while [ ! -e runs/.chain15/cache_arpi3000.done ]; do
  log "waiting for cache prebuild (runs/.chain15/cache_arpi3000.done)"
  sleep 120
done
WAITED=0
while [ ! -e /tmp/bench_gate_open ] && [ $WAITED -lt 3600 ]; do
  log "waiting for foreground bench gate (/tmp/bench_gate_open), ${WAITED}s"
  sleep 120; WAITED=$((WAITED + 120))
done

# ---- Phase 2+3 interleaved: train leg -> bank exports ------------------------
KNOBS="--residual-prior --prior irls --loss huber --min-cam-dist 1.2 --spread 0.8,2.0 --prior-dropout 0.15"
wait_relay
RES=""
for SB in 1000 2000 3000 4000; do
  stage pani_leg$SB 9000 python scripts/train_lifter_big.py \
    --out runs/pan_irls --cache-dir runs/cache $KNOBS --ema 0.999 \
    --seed-base $SB $RES
  RES="--resume"
  bank_pan $SB
  if [ "$SB" = 2000 ]; then
    # mid-chain checkpoint row: one dense eval so a quality number exists
    # even if later legs die with the environment
    stage eval_irls_dense_mid 5400 python scripts/eval_synthetic.py \
      --models runs/eval_irls --seed 30 --spread 1.2 \
      --out reports/panoptic_irls_dense_mid_r2l.json
  fi
done
RES=""
for SB in 1000 2000 3000; do
  stage arpi_leg$SB 9000 python scripts/train_lifter_big.py \
    --out runs/arp_irls --cache-dir runs/cache --env ARPLAB $KNOBS \
    --ema 0.999 --seed-base $SB $RES
  RES="--resume"
  bank_arp $SB
done

# ---- final eval rows (same as chain19 phase 3) --------------------------------
wait_relay
if [ -e runs/pan_irls/pose_estimator.npz ]; then
  EVI="python scripts/eval_synthetic.py --models runs/eval_irls"
  stage eval_irls_dense 5400 $EVI --seed 30 --spread 1.2 \
    --out reports/panoptic_irls_dense_r2l.json
  stage eval_irls_wide 5400 $EVI --seed 30 --spread 1.8 \
    --out reports/panoptic_irls_wide_r2l.json
  stage eval_irls_extreme 5400 $EVI --seed 30 --spread 2.1 \
    --out reports/panoptic_irls_extreme_r2l.json
  stage eval_irls_outlier 5400 $EVI --seed 31 --spread 1.2 \
    --outlier-rate 0.07 --out reports/panoptic_irls_outlier_r2l.json
  stage irls_extreme_gate 5400 $EVI --seed 30 --spread 2.1 --prior-gate 8 \
    --out reports/panoptic_irls_extreme_gate_r2m.json
  stage irls_wide_gate 5400 $EVI --seed 30 --spread 1.8 --prior-gate 8 \
    --out reports/panoptic_irls_wide_gate_r2m.json
fi
if [ -e runs/arp_irls/pose_estimator.npz ]; then
  ARPI="python scripts/eval_arplab.py --matcher models_demo/arplab --lifter runs/arp_irls"
  stage eval_arpi_clean 5400 $ARPI \
    --out reports/arplab_irls_clean_r2l.json
  stage eval_arpi_outlier 5400 $ARPI --outlier-rate 0.07 \
    --out reports/arplab_irls_outlier_r2l.json
fi

log "CHAIN20 ALL DONE"
