#!/bin/bash
# r5 wave-2 serving A/Bs vs the new 109-fps default (bench_default.log):
#  - kernel ILP reorder (NFE_KERNEL_ILP, parity-tested bit-identical)
#  - narrower windows from the measured span distribution
#    (scripts/measure_spans.py, 16 orbit-spread cams: max u/v span 33 →
#     WX=44/SX=8 limit 34 [1 of margin — aggressive], WX=44/SX=4 limit 38
#     [safe, 2× canvas blocks, same per-tile fetch], WY=56/SY=16 limit 38
#     [safe]; the NaN guard makes an infeasible geometry loud)
#  - NHWC SR re-check at the new op balance.
# NOTE: every env key here is in bench._LADDER_KEYS, so each run pins
# "variant: pinned" (no ladder).
cd "$(dirname "$0")/.."
run() { name=$1; shift
  { time env "$@" NFE_BENCH_FRAMES=128 python bench.py ; } \
    > runs/hw_r5/ab2_$name.log 2> runs/hw_r5/ab2_$name.err
  echo "== $name: $(grep -a '"metric"' runs/hw_r5/ab2_$name.log)"
}
run ilp        NFE_KERNEL_ILP=1
run wy56       NFE_WIN_GEOM=48,8,56,16
run geom       NFE_WIN_GEOM=44,4,56,16
run wx44s8     NFE_WIN_GEOM=44,8,56,16
run ilp_geom   NFE_KERNEL_ILP=1 NFE_WIN_GEOM=44,4,56,16
run nhwc       NFE_SR_NHWC=1
echo DONE
