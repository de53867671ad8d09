#!/bin/bash
# Chain 21 (Aug 21): the Aug-21 ~16:00 environment reset killed chain20
# after all 7 IRLS training legs had completed AND banked their servable
# exports (models_demo/{pan,arp}_irls{,_bf16}) — but before the final
# eval rows ran.  This chain runs exactly those rows, driven from the
# committed bf16 exports (bit-identical to the TPU bf16 serving path;
# runs/ fp32 checkpoints are gone).  Most-valuable rows first so a
# partial run still banks a full quality story.
# Usage: nohup bash scripts/relay_chain21.sh >> /tmp/chain21.log 2>&1 &
#        echo $! > /tmp/chain21.pid
set -u
cd /root/repo
SENT=runs/.chain21
LOGD=reports/chain21_logs
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

EVI="python scripts/eval_synthetic.py --models models_demo/pan_irls_bf16"
ARPI="python scripts/eval_arplab.py --matcher models_demo/arp_irls_bf16 --lifter models_demo/arp_irls_bf16"

stage eval_irls_dense 4200 $EVI --seed 30 --spread 1.2 \
  --out reports/panoptic_irls_dense_r2l.json
stage eval_arpi_clean 4200 $ARPI \
  --out reports/arplab_irls_clean_r2l.json
stage eval_irls_outlier 4200 $EVI --seed 31 --spread 1.2 --outlier-rate 0.07 \
  --out reports/panoptic_irls_outlier_r2l.json
stage eval_irls_wide 4200 $EVI --seed 30 --spread 1.8 \
  --out reports/panoptic_irls_wide_r2l.json
stage eval_arpi_outlier 4200 $ARPI --outlier-rate 0.07 \
  --out reports/arplab_irls_outlier_r2l.json
stage eval_irls_extreme 4200 $EVI --seed 30 --spread 2.1 \
  --out reports/panoptic_irls_extreme_r2l.json
stage irls_extreme_gate 4200 $EVI --seed 30 --spread 2.1 --prior-gate 8 \
  --out reports/panoptic_irls_extreme_gate_r2m.json
stage irls_wide_gate 4200 $EVI --seed 30 --spread 1.8 --prior-gate 8 \
  --out reports/panoptic_irls_wide_gate_r2m.json

log "CHAIN21 ALL DONE"
