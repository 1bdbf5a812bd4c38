#!/bin/bash
# r4 serving A/B round 2: static tile-order / patch-shape levers against
# the canvas-DMA plateau (docs/PERF.md r4). Run on the real chip.
set -u
cd "$(dirname "$0")/.."
OUT=runs/hw_r4
mkdir -p "$OUT"
BASE="NFE_BENCH_FRAMES=128 NFE_BENCH_GROUP=1 NFE_BENCH_SR_BF16=1"

run() { # name env...
  local name=$1; shift
  echo "=== $name ($*) ==="
  env NFE_BENCH_FRAMES=128 NFE_BENCH_GROUP=1 NFE_BENCH_SR_BF16=1 "$@" \
    timeout 900 python bench.py 2>"$OUT/bench$name.err"
  echo "$name rc=$?"
}

run Q NFE_TILE_ORDER=patch
run R NFE_TILE_ORDER=patch NFE_PATCH=8,4,8
run S NFE_TILE_ORDER=patch NFE_PATCH=4,8,8
run T NFE_PATCH=8,4,8
