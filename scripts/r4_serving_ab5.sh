#!/bin/bash
# Round-4 serving A/B, wave 5 (replaces ab4's remaining legs after
# NFE_TILED_COMPOSITE=1 timed out the pipeline emitter at f128 —
# runs/hw_r4/ab4.log T1 rc=124, same signature as the sorted kernel's
# dynamic-output-map hang): in-kernel point math alone and combined with
# the 512-pt tile shape.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/nfe_jaxcache}
OUT=runs/hw_r4

leg() {
  local name=$1; shift
  echo "== $name ($*) =="
  env "$@" timeout 1200 python bench.py 2>"$OUT/ab5_$name.err"
  echo "rc=$?"
}

leg K1 NFE_INKERNEL_PTS=1 NFE_BENCH_FRAMES=128
leg K3 NFE_INKERNEL_PTS=1 NFE_TILE_P=512 NFE_BENCH_FRAMES=128
