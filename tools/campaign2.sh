#!/bin/bash
# Round-2 follow-up campaign: re-measure the FIXED sweep-scatter kernel
# (lane-major id layout / 8-aligned group DMA) against the XLA scatter and
# through the flagship bench. Waits for an existing device user (PID $2)
# to exit first so timings are uncontended.
set -u
cd /root/repo
OUT=${1:-/tmp/campaign2}
WAIT_PID=${2:-}
mkdir -p "$OUT"

log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/campaign.log"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID to release the device"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi

phase() { # usage: phase <name> <timeout_s> cmd...
  local name=$1 t=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "$name: already done, skip"; return; fi
  log "=== $name start: $*"
  timeout "$t" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  log "=== $name rc=$rc"
  grep -h '^{' "$OUT/$name.out" | tail -20 >> "$OUT/campaign.log"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
}

log "campaign2 begin"

phase sweep_micro 3600 env PB_N=158720 python tools/pallas_bench.py \
    xla_scatter sweep_mxu_presorted pallas_sweep_mxu sweep_unsorted

phase bench_sweep    2400 env BENCH_KG=0 GRAPHVITE_SWEEP_SCATTER=1 python bench.py
phase bench_sweep_ctx 2400 env BENCH_KG=0 GRAPHVITE_SWEEP_SCATTER=1 \
    GRAPHVITE_SWEEP_CONTEXT=1 python bench.py
phase bench_ctx_only 2400 env BENCH_KG=0 GRAPHVITE_SWEEP_CONTEXT=1 python bench.py

log "campaign2 end"
