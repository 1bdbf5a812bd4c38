#!/bin/bash
# Round-4 serving A/B, wave 4: tiled composite (no payload untile) and
# 512-point tiles (deeper MXU N dim; patch 16,8,4 measured max span 29 on
# the bench orbit — fits the default 48/8 windows, scripts/measure_spans.py).
# Run AFTER the chip is free; each leg is a pinned bench.py variant.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/nfe_jaxcache}
OUT=runs/hw_r4

leg() {
  local name=$1; shift
  echo "== $name ($*) =="
  env "$@" timeout 1200 python bench.py 2>"$OUT/ab4_$name.err"
  echo "rc=$?"
}

leg T1 NFE_TILED_COMPOSITE=1 NFE_BENCH_FRAMES=128
leg T2 NFE_TILE_P=512 NFE_PATCH=16,8,4 NFE_BENCH_FRAMES=128
leg T3 NFE_TILED_COMPOSITE=1 NFE_TILE_P=512 NFE_PATCH=16,8,4 NFE_BENCH_FRAMES=128
leg T4 NFE_TILED_COMPOSITE=1 NFE_TILE_P=512 NFE_PATCH=16,8,4 NFE_WIN_GEOM=40,8,64,24 NFE_BENCH_FRAMES=128
# in-kernel point math (the ~1.1 ms/frame of outside coords HLO moves onto
# the kernel's idle VPU; interpret-parity bit-identical)
leg K1 NFE_INKERNEL_PTS=1 NFE_BENCH_FRAMES=128
leg K2 NFE_INKERNEL_PTS=1 NFE_TILED_COMPOSITE=1 NFE_BENCH_FRAMES=128
