#!/bin/bash
# Round-3 hardware measurement queue — run top to bottom as soon as the TPU
# tunnel is alive. Each stage logs to runs/hw_r3/ and tolerates individual
# failures so one wedged variant doesn't block the rest.
#
# Usage: bash scripts/r3_hw_runbook.sh [stage ...]   (default: all)
cd "$(dirname "$0")/.."
mkdir -p runs/hw_r3
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/nfe_jaxcache}

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a runs/hw_r3/runbook.log; }
stage() {  # stage <name> <timeout-s> <cmd...>
  local name="$1" t="$2"; shift 2
  log "== $name =="
  timeout "$t" "$@" > "runs/hw_r3/$name.log" 2>&1
  local rc=$?
  tail -3 "runs/hw_r3/$name.log" | tee -a runs/hw_r3/runbook.log
  log "== $name done rc=$rc =="
}

want() { [ $# -eq 0 ] || [[ " $* " == *" $1 "* ]]; }
ARGS=("$@")

# 1. headline with committed defaults (also warms the serving compile cache)
want bench "${ARGS[@]}" && stage bench 2700 python bench.py

# 2. serving A/B sweep (decomposed, resident canvas, bf16 SR, group8)
want ab "${ARGS[@]}" && stage ab 9000 bash scripts/bench_ab.sh

# 3. kernel-level split microbenches (sampling-stage MXU utilization A/B)
want ksplit "${ARGS[@]}" && stage ksplit 2700 python scripts/bench_kernel_split.py

# 4. training step: batch × amp grid (batch 4 fp32 is the r2 baseline point)
if want train "${ARGS[@]}"; then
  stage train_b4 3600 python scripts/bench_train.py 4 1 0
  stage train_b4_amp 3600 python scripts/bench_train.py 4 1 1
  stage train_b8_amp 3600 python scripts/bench_train.py 8 1 1
  stage train_b16m2_amp 4500 python scripts/bench_train.py 16 2 1
  stage train_b4_amp_ck 3600 env NFE_COMPOSITE_KERNEL=1 \
    NFE_COMPOSITE_KERNEL_TRAIN=1 python scripts/bench_train.py 4 1 1
fi

# 5. HLO-attributed serving profile (feeds the long-tail fusion audit)
want profile "${ARGS[@]}" && stage profile 2700 python scripts/profile_decode.py

# 6. sustained 512² training demo (fresh → kill → resume); long — keep last
want demo "${ARGS[@]}" && stage demo 21000 bash scripts/train_demo.sh runs/demo 600 1200

log "runbook complete"
