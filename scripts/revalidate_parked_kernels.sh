#!/bin/bash
# Re-probe the libtpu-parked kernel variants after a toolchain update.
#
# Each parked variant has a reproducible compile failure recorded in
# ops/triplane_kernel._PARKED_BAD (pipeline-emitter hang / windowing-proof
# SIGABRT). This script runs a bounded COMPILE-ONLY probe per variant via
# the remote compile service (does not claim the chip) and reports
# PASS/FAIL. When a variant passes on a new build, remove that build's entry
# from _PARKED_BAD (the script prints the current build id) and A/B the
# variant for real before promoting it.
#
# Usage: bash scripts/revalidate_parked_kernels.sh [timeout_seconds]
set -u
cd "$(dirname "$0")/.."
T=${1:-900}

BUILD=$(python - <<'EOF' 2>/dev/null
from jax._src import xla_bridge
v = getattr(xla_bridge.get_backend(), "platform_version", "")
import re
m = re.search(r"cl/\d+", v)
print(m.group(0) if m else v.replace("\n", " "))
EOF
)
echo "current toolchain build: ${BUILD}"

probe() {
  local name="$1"; shift
  echo "--- ${name}: compile-only probe (timeout ${T}s) ---"
  if env "$@" NFE_PARKED_OK=1 NFE_BENCH_COMPILE_ONLY=1 \
       timeout "$T" python bench.py > "/tmp/reval_${name}.log" 2>&1; then
    echo "PASS ${name} — remove '${BUILD}' from _PARKED_BAD[\"${name}\"] and A/B it"
  else
    rc=$?
    echo "FAIL ${name} (rc=${rc}; 124=timeout/hang, 134=SIGABRT) — keep parked"
  fi
  tail -1 "/tmp/reval_${name}.log" | cut -c1-200
}

probe "NFE_SORTED_KERNEL"    NFE_SORTED_KERNEL=1
probe "NFE_RESIDENT_CANVAS"  NFE_RESIDENT_CANVAS=1 NFE_BENCH_FUSED=0
probe "NFE_TILED_COMPOSITE=1" NFE_TILED_COMPOSITE=1
