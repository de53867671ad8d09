#!/bin/bash
# Chain 19 (Aug 19, reset recovery): the environment reset wiped runs/
# (all fp32 checkpoints + caches) and killed chains 14-18 before any of
# their reports landed.  What survives is committed: the int8 servable
# exports in models_demo/ (matcher fp32 + lifter int8) and the chain
# scripts.  This chain rebuilds the queue against the new reality:
#
# Phase 0 (CPU, relay-independent):
#   - reconstruct eval dirs from the committed exports
#   - chain14's corrected-protocol rows (eval_synthetic now reads the
#     prior variant from the meta) measured on CPU from the int8
#     pan_res export -> *_i8cpu_r2k.json (labeled: stored=int8,
#     backend=cpu).  The triangulation rows in the same reports are
#     lifter-independent, so chain14-C and chain16's tri-comparator
#     rows come along for free.
#   - ARP rows from the int8 arplab export (chain16-A comparators).
#
# Phase 1 (relay, cheap first — bank results in case it dies again):
#   - chain17's corrected compact-vs-full latency A/B (int8 exports ARE
#     the servables, so these are exactly the intended measurements)
#   - chain18's fused-MLP A/B on the compact lifter
#
# Phase 2 (relay, training): chain15's IRLS-prior lifter rebuilds —
#   4 Panoptic legs -> runs/pan_irls, 3 ARP legs -> runs/arp_irls
#   (caches prebuilt by scripts/prebuild_irls_caches.sh sentinels).
#
# Phase 3 (relay): TPU evals of the fresh fp32 IRLS lifters (pan
#   dense/wide/extreme/outlier + gate rows = chains 15-C/16-B; ARP
#   clean/outlier) and exports — BOTH int8 and bf16 this time (bf16 is
#   bit-identical to TPU serving: quality numbers survive a reset).
#
# Idempotent via runs/.chain19 sentinels; logs in reports/chain19_logs/.
# Usage: nohup bash scripts/relay_chain19.sh >> /tmp/chain19.log 2>&1 &
#        echo $! > /tmp/chain19.pid
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

# ---- Phase 0a: reconstruct eval dirs from committed exports -------------------
for pair in "eval_res pan_res" "eval_compact pan_compact" "arp_res arplab"; do
  set -- $pair
  if [ ! -e "runs/$1/pose_estimator.npz" ]; then
    mkdir -p "runs/$1"
    cp models_demo/$2/*.npz models_demo/$2/*.json "runs/$1/"
    log "reconstructed runs/$1 from models_demo/$2 (int8 servable)"
  fi
done

# ---- Phase 0b: CPU corrected-protocol rows from the int8 exports --------------
EV="python scripts/eval_synthetic.py --cpu --models runs/eval_res"
OUTL="--outlier-rate 0.07"
stage i8_dense_plain 14400 $EV --seed 30 --spread 1.2 \
  --out reports/panoptic_dense_plain_i8cpu_r2k.json
stage i8_wide_plain 14400 $EV --seed 30 --spread 1.8 \
  --out reports/panoptic_wide_plain_i8cpu_r2k.json
stage i8_extreme_plain 14400 $EV --seed 30 --spread 2.1 \
  --out reports/panoptic_extreme_plain_i8cpu_r2k.json
stage i8_outlier_plain 14400 $EV --seed 31 --spread 1.2 $OUTL \
  --out reports/panoptic_outlier_plain_i8cpu_r2k.json
stage i8_outlier_medgate 14400 $EV --seed 31 --spread 1.2 $OUTL \
  --prior-gate 8 --out reports/panoptic_outlier_medgate_i8cpu_r2k.json
stage i8_dense_irlstri 14400 $EV --seed 30 --spread 1.2 --tri-variant irls \
  --out reports/panoptic_dense_irlstri_i8cpu_r2k.json
stage i8_extreme_irlstri 14400 $EV --seed 30 --spread 2.1 --tri-variant irls \
  --out reports/panoptic_extreme_irlstri_i8cpu_r2k.json
stage i8_outlier_irlstri 14400 $EV --seed 31 --spread 1.2 $OUTL \
  --tri-variant irls --out reports/panoptic_outlier_irlstri_i8cpu_r2k.json
stage i8_wide_irlstri 14400 $EV --seed 30 --spread 1.8 --tri-variant irls \
  --out reports/panoptic_wide_irlstri_i8cpu_r2k.json

ARP="python scripts/eval_arplab.py --cpu --matcher models_demo/arplab --lifter runs/arp_res"
stage i8_arp_clean 14400 $ARP \
  --out reports/arplab_clean_i8cpu_r2m.json
stage i8_arp_irlstri_clean 14400 $ARP --tri-variant irls \
  --out reports/arplab_irlstri_clean_i8cpu_r2m.json
stage i8_arp_irlstri_outlier 14400 $ARP --tri-variant irls $OUTL \
  --out reports/arplab_irlstri_outlier_i8cpu_r2m.json

# ---- Phase 1: latency A/Bs (cheap, bank first) --------------------------------
wait_relay
LAT="python scripts/bench_serve_dtype.py --decode-top-k 64 --threshold 0.5"
stage lat_compact_fixed 2400 $LAT --modelsdir runs/eval_compact
stage lat_reference_fixed 2400 $LAT --modelsdir runs/eval_res
stage fusedmlp_compact 2400 python scripts/bench_fused_mlp.py \
  --modelsdir runs/eval_compact

# ---- Phase 2: IRLS-prior lifter training legs ----------------------------------
# caches from scripts/prebuild_irls_caches.sh (sentinels runs/.chain15)
while [ ! -e runs/.chain15/cache_arpi3000.done ]; do
  log "waiting for cache prebuild (runs/.chain15/cache_arpi3000.done)"
  sleep 120
done
KNOBS="--residual-prior --prior irls --loss huber --min-cam-dist 1.2 --spread 0.8,2.0 --prior-dropout 0.15"
wait_relay
RES=""
for SB in 1000 2000 3000 4000; do
  stage pani_leg$SB 9000 python scripts/train_lifter_big.py \
    --out runs/pan_irls --cache-dir runs/cache $KNOBS --ema 0.999 \
    --seed-base $SB $RES
  RES="--resume"
done
RES=""
for SB in 1000 2000 3000; do
  stage arpi_leg$SB 9000 python scripts/train_lifter_big.py \
    --out runs/arp_irls --cache-dir runs/cache --env ARPLAB $KNOBS \
    --ema 0.999 --seed-base $SB $RES
done

# ---- Phase 3: TPU evals of the fresh fp32 IRLS lifters + exports ---------------
wait_relay
if [ -e runs/pan_irls/pose_estimator.npz ]; then
  mkdir -p runs/eval_irls
  cp models_demo/widefield/skeleton_matching.npz \
     models_demo/widefield/skeleton_matching.json runs/eval_irls/
  cp runs/pan_irls/pose_estimator.npz runs/pan_irls/pose_estimator.json \
     runs/eval_irls/
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
  stage export_pan_irls 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/eval_irls --out models_demo/pan_irls
  stage export_pan_irls_bf16 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/eval_irls --dtype bf16 --out models_demo/pan_irls_bf16
fi
if [ -e runs/arp_irls/pose_estimator.npz ]; then
  ARPI="python scripts/eval_arplab.py --matcher models_demo/arplab --lifter runs/arp_irls"
  stage eval_arpi_clean 5400 $ARPI \
    --out reports/arplab_irls_clean_r2l.json
  stage eval_arpi_outlier 5400 $ARPI --outlier-rate 0.07 \
    --out reports/arplab_irls_outlier_r2l.json
  mkdir -p runs/eval_arpi
  cp models_demo/arplab/skeleton_matching.npz \
     models_demo/arplab/skeleton_matching.json runs/eval_arpi/ 2>/dev/null
  cp runs/arp_irls/pose_estimator.npz runs/arp_irls/pose_estimator.json \
     runs/eval_arpi/
  stage export_arp_irls 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/eval_arpi --rig ARPLAB --out models_demo/arp_irls
  stage export_arp_irls_bf16 1800 python -m mpe3d_tpu export-servable \
    --modelsdir runs/eval_arpi --rig ARPLAB --dtype bf16 \
    --out models_demo/arp_irls_bf16
fi

log "CHAIN19 ALL DONE"
