#!/bin/bash
# Serving-bench A/B sweep (run on the real chip when the tunnel is up).
# Each variant is a fresh process (env-selected kernel/layout switches are
# read at trace time). Compile caches persist across runs.
cd "$(dirname "$0")/.."

# shared persistent compile cache across the per-variant processes
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/nfe_jaxcache}

run() {
  local name="$1"; shift
  echo "== $name =="
  env "$@" timeout 2400 python bench.py || echo "$name FAILED/TIMEOUT"
}

run baseline NFE_NOOP=0
run composite-kernel NFE_COMPOSITE_KERNEL=1
run fused+resident NFE_RESIDENT_CANVAS=1
run fused+resident+composite NFE_RESIDENT_CANVAS=1 NFE_COMPOSITE_KERNEL=1
# smaller windows only make sense with a resident canvas (no per-tile DMA)
run resident+win64 NFE_RESIDENT_CANVAS=1 NFE_WIN_GEOM=64,16,64,32
run resident+win3264 NFE_RESIDENT_CANVAS=1 NFE_WIN_GEOM=32,8,64,32
# y-stride = y-window: 4x canvas (48 MB resident total) — VMEM-safe hedge;
# straddling tiles NaN-poison and the bench ladder reports the failure
run resident+sy128 NFE_RESIDENT_CANVAS=1 NFE_WIN_GEOM=64,16,128,128
run decomposed NFE_BENCH_FUSED=0
run decomposed+resident NFE_BENCH_FUSED=0 NFE_RESIDENT_CANVAS=1
run sr-bf16 NFE_BENCH_SR_BF16=1
run sr-bf16+composite NFE_BENCH_SR_BF16=1 NFE_COMPOSITE_KERNEL=1
run group8 NFE_BENCH_GROUP=8
