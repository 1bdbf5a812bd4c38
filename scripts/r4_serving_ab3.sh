#!/bin/bash
# r4 serving A/B round 3: (a) the chunk-cap hypothesis — the group>=2
# flattened SIGABRT (runs/hw_r4/benchL.err) fires in the Pallas custom
# call's OUTPUT windowing proof with point chunks of EXACTLY 2^18; if the
# proof is strict-<, NFE_MAX_MT just below unlocks multi-frame bodies and
# amortizes the per-iteration scan overhead; (b) the static-output sorted
# kernel (dynamic maps on INPUTS only — the dynamic-OUTPUT variant hung
# the pipeline emitter, benchN); (c) X-only window shrink at K=128.
set -u
cd "$(dirname "$0")/.."
OUT=runs/hw_r4
mkdir -p "$OUT"

run() { # name env...
  local name=$1; shift
  echo "=== $name ($*) ==="
  env NFE_BENCH_FRAMES=128 NFE_BENCH_SR_BF16=1 "$@" \
    timeout 900 python bench.py 2>"$OUT/bench$name.err"
  echo "$name rc=$?"
}

# (a) chunk cap vs group size. 196608 = the known-good group-1 extent.
run X1 NFE_BENCH_GROUP=2 NFE_MAX_MT=196608
run X2 NFE_BENCH_GROUP=4 NFE_MAX_MT=196608
run X3 NFE_BENCH_GROUP=2 NFE_MAX_MT=131072

# (b) sorted-v2: on-chip value parity first, then bench. NOTE: do NOT set
# NFE_SORTED_KERNEL here — the script toggles tk._SORTED_FORCE itself; the
# env var would force BOTH sides sorted and make the compare vacuous.
echo "=== sorted-v2 parity ==="
timeout 1200 python scripts/parity_sorted_tpu.py \
  2>"$OUT/parity_sorted2.err"
echo "parity rc=$?"
run Y1 NFE_BENCH_GROUP=1 NFE_SORTED_KERNEL=1
# sorted removes the DMA penalty that made small windows lose in r2;
# X-shrink keeps the matmul K dim at 128 (WY untouched)
run Y2 NFE_BENCH_GROUP=1 NFE_SORTED_KERNEL=1 NFE_WIN_GEOM=48,8,128,64
# sorted at the r2 geometry (bigger blocks = fewer, larger DMAs — the
# regime the sorted sweep was designed for; default is now 56,16,64,24)
run Y3 NFE_BENCH_GROUP=1 NFE_SORTED_KERNEL=1 NFE_WIN_GEOM=64,16,128,64

# (c) X-only shrink on the streaming kernel (FLOPs -25%, K stays 128)
run Z1 NFE_BENCH_GROUP=1 NFE_WIN_GEOM=48,8,128,64
