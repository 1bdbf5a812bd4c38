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
# resident canvas at sy128 (75 MB operand, below the 96 MB SIGABRT point;
# geometry coverage fixed this round — benchG.err was a Python pad bug)
run U NFE_RESIDENT_CANVAS=1 NFE_WIN_GEOM=64,16,128,128
# small windows (max measured span 33 + stride + 1): halves the one-hot
# FLOPs; r2 measured small windows SLOWER under depth order (DMA-bound),
# patch order changes the fetch pattern — re-test both orders
run V NFE_TILE_ORDER=patch NFE_WIN_GEOM=56,16,64,24
run W NFE_WIN_GEOM=56,16,64,24
# scan-overhead microbench rides the same chip slot
echo "=== scan overhead ==="
timeout 600 python scripts/bench_scan_overhead.py 2>"$OUT/scan_overhead.err"
echo "scan rc=$?"
