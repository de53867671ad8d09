#!/bin/bash
# IRLS knob sweep (CPU, queued behind the cache prebuild): validate the
# shipped defaults (iters=5, delta_px=4.0) on the packed-prior shoot-out
# grid.  Writes reports/triangulator_sweep/<env>_i<I>_d<D>.json.
set -u
cd /root/repo
OUTD=reports/triangulator_sweep
mkdir -p $OUTD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

PRE=$(cat /tmp/prebuild_irls.pid 2>/dev/null || echo "")
while [ -n "$PRE" ] && kill -0 "$PRE" 2>/dev/null; do
  log "cache prebuild (pid $PRE) still running; sleeping 300s"
  sleep 300
done
log "prebuild finished — starting sweep"

for ENV in PANOPTIC ARPLAB; do
  for I in 2 5 8; do
    for D in 2.0 4.0 8.0; do
      OUT=$OUTD/${ENV}_i${I}_d${D}.json
      if [ -e "$OUT" ]; then log "skip $OUT"; continue; fi
      log "run $ENV iters=$I delta=$D"
      timeout 3600 nice -n 19 python scripts/diag_triangulators.py \
        --cpu --env $ENV --n 120 --irls-iters $I --irls-delta-px $D \
        --out "$OUT" > /dev/null 2>&1 || log "FAIL $OUT"
    done
  done
done
log "SWEEP DONE"
