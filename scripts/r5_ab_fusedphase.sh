#!/bin/bash
# r5 A/B #1: NFE_FUSED_PHASE on-chip vs the r4 default (92.7 fps).
cd /root/repo
set -x
{ time NFE_BENCH_FRAMES=128 python bench.py ; } > runs/hw_r5/ab_default.log 2> runs/hw_r5/ab_default.err
{ time NFE_BENCH_FRAMES=128 NFE_FUSED_PHASE=1 python bench.py ; } > runs/hw_r5/ab_fusedphase.log 2> runs/hw_r5/ab_fusedphase.err
echo DONE
