#!/bin/bash
# r4 hardware training-step grid (VERDICT r3 item 4): measure sec/kimg for
# batch x amp x composite-kernel-train on the real chip and commit the
# numbers to docs/PERF.md. Persistent compile cache cuts the per-config
# phase-compile bill on repeats.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/nfe_jaxcache}
OUT=runs/hw_r4
mkdir -p "$OUT"

run() { # name batch micro amp extra_env...
  local name=$1 batch=$2 micro=$3 amp=$4; shift 4
  echo "=== $name (batch=$batch micro=$micro amp=$amp $*) ==="
  env "$@" timeout 2400 python scripts/bench_train.py "$batch" "$micro" "$amp" \
    2>"$OUT/train_$name.err"
  echo "$name rc=$?"
}

run T1_b4_fp32 4 1 0
run T2_b4_amp 4 1 1
run T3_b4_amp_ck 4 1 1 NFE_COMPOSITE_KERNEL=1 NFE_COMPOSITE_KERNEL_TRAIN=1
run T4_b8_amp 8 1 1
run T5_b8m2_amp 8 2 1
