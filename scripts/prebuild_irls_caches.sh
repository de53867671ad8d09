#!/bin/bash
# Pre-build chain15's IRLS-prior dataset caches on the idle CPU while
# chains 13/14 hold the relay.  Writes the SAME sentinels chain15's
# stage() checks (runs/.chain15/cache_*.done), so chain15 skips straight
# to the training legs when its turn comes.  nice 19: the live chains'
# relay loops keep the core whenever they want it.
set -u
cd /root/repo
SENT=runs/.chain15
LOGD=reports/chain15_logs
mkdir -p $SENT $LOGD
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*"; }

stage() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$SENT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  if timeout "$tmo" nice -n 19 "$@" > "$LOGD/$name.log" 2>&1; then
    touch "$SENT/$name.done"; log "done $name"
  else
    log "FAIL $name (rc=$?, log $LOGD/$name.log) — continuing"
    return 1
  fi
}

KNOBS="--residual-prior --prior irls --loss huber --min-cam-dist 1.2 --spread 0.8,2.0 --prior-dropout 0.15"

for SB in 1000 2000 3000 4000; do
  stage cache_pani$SB 21600 python scripts/train_lifter_big.py \
    --out runs/pan_irls --cpu --build-cache-only --cache-dir runs/cache \
    $KNOBS --seed-base $SB
done
for SB in 1000 2000 3000; do
  stage cache_arpi$SB 21600 python scripts/train_lifter_big.py \
    --out runs/arp_irls --cpu --build-cache-only --cache-dir runs/cache \
    --env ARPLAB $KNOBS --seed-base $SB
done
log "PREBUILD ALL DONE"
