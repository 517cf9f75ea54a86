#!/bin/bash
# Round-2 device measurement campaign (run on the real TPU when the axon
# tunnel is up). Produces /tmp/device_campaign/*.out|err and a summary log.
#
# Phases:
#   1. sweep_verify        — compiled-mode correctness of the Pallas tile-
#                            sweep scatter (sorted + unsorted front-ends)
#   2. sweep_micro         — ns/row of the sweep kernel vs the XLA scatter
#                            at the bench shapes (V=1M, N=batch)
#   3. bench_default       — LINE pillar, current defaults (reference point)
#   4. bench_sweep         — + GRAPHVITE_SWEEP_SCATTER=1 (vertex side)
#   5. bench_sweep_ctx     — + GRAPHVITE_SWEEP_CONTEXT=1 (context side)
#   6. bench_kg            — RotatE dim-2048 K=64 pillar (pooled step)
#   7. blocked_ab          — flat vs blocked episodes at V=4M (VERDICT item 9)
#   8. trace               — device-trace stage breakdown of the best config
set -u
cd /root/repo
OUT=${1:-/tmp/device_campaign}
mkdir -p "$OUT"

log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/campaign.log"; }

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

log "campaign begin"

phase sweep_verify 2400 python tools/pallas_bench.py sweep_verify sweep_unsorted_verify

# micro: sorted-vertex-side N (bench effective batch, 1024-rounded) and the
# unsorted context-side N (batch + pool rows)
phase sweep_micro 3600 env PB_N=158720 python tools/pallas_bench.py \
    xla_scatter sweep_mxu_presorted pallas_sweep_mxu sweep_unsorted

phase bench_default  2400 env BENCH_KG=0 python bench.py
phase bench_sweep    2400 env BENCH_KG=0 GRAPHVITE_SWEEP_SCATTER=1 python bench.py
phase bench_sweep_ctx 2400 env BENCH_KG=0 GRAPHVITE_SWEEP_SCATTER=1 \
    GRAPHVITE_SWEEP_CONTEXT=1 python bench.py
phase bench_ctx_only 2400 env BENCH_KG=0 GRAPHVITE_SWEEP_CONTEXT=1 python bench.py

phase bench_kg 4800 python bench.py --kg-only

phase blocked_ab 4800 python tools/blocked_ab.py 4000000

log "campaign end"
