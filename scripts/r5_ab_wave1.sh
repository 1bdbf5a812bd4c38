#!/bin/bash
# r5 wave-1 serving A/Bs: static composite kernel, transposed coords,
# NHWC+fused-phase SR — each vs the r4 default (92.79 fps, ab_default.log).
cd "$(dirname "$0")/.."
run() { name=$1; shift
  { time env "$@" NFE_BENCH_FRAMES=128 python bench.py ; } \
    > runs/hw_r5/ab_$name.log 2> runs/hw_r5/ab_$name.err
  echo "== $name: $(grep -a '"metric"' runs/hw_r5/ab_$name.log)"
}
run tc2         NFE_TILED_COMPOSITE=2
run coordst     NFE_COORDS_T=1
run tc2_coordst NFE_TILED_COMPOSITE=2 NFE_COORDS_T=1
run nhwc_fused  NFE_SR_NHWC=1 NFE_FUSED_PHASE=1
run all4        NFE_TILED_COMPOSITE=2 NFE_COORDS_T=1 NFE_SR_NHWC=1 NFE_FUSED_PHASE=1
echo DONE
