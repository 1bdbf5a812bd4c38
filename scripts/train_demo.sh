#!/bin/bash
# Sustained-training demonstration (VERDICT r2 item 5): ~1.2k steps at the
# real FFHQ config (512², 64² render, 48+48 samples, seg CE via random-init
# BiSeNet, per-label histogram Greg, ADA, gen-pose-cond) on the synthetic
# 3D-consistent dataset, WITH a mid-run kill + resume.
#
# Usage: bash scripts/train_demo.sh [outdir] [steps1] [steps2]
set -e
cd "$(dirname "$0")/.."

# Persistent XLA compile cache: the resume phase is a fresh process and
# would otherwise re-pay the full phase-compile bill.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/nfe_jaxcache}

# XLA:CPU's LLVM JIT allocates mmap regions per compiled code section; the
# training loop's program set crosses the default vm.max_map_count=65530
# around the first snapshot tick (measured 66k+ maps → LLVM ENOMEM →
# SIGSEGV, r3). Only affects the CPU-backend rehearsal path; TPU compiles
# remotely. Best-effort raise (root; ignored otherwise).
sysctl -w vm.max_map_count=1048576 >/dev/null 2>&1 || true

OUT=${1:-runs/demo}
S1=${2:-600}
S2=${3:-1200}
# Overridable for a reduced-scale (e.g. CPU-backend) demonstration:
#   DATA=runs/synth128.zip TICK=0.02 EXTRA="--cbase 4096 --cmax 128 ..." …
DATA=${DATA:-runs/synth512.zip}
BATCH=${BATCH:-8}
TICK=${TICK:-0.2}
EXTRA=${EXTRA:-}

[ -f "$DATA" ] || python scripts/make_synthetic_dataset.py --out "$DATA" --n 2000 --res 512

COMMON="--data $DATA --outdir $OUT --batch $BATCH --gamma 1 --gen-pose-cond \
  --aug ada --face-parser random --precision default --amp \
  --tick $TICK --snap 5 --blur-fade-kimg 20 $EXTRA"

# phase 1: fresh run to S1 steps
python -m nerffaceediting_tpu.apps.train $COMMON --max-steps "$S1"

# phase 2: resume from the latest snapshot, continue to S2 total
RUN_DIR=$(ls -dt "$OUT"/*/ | head -1)
SNAP=$(ls -dt "$RUN_DIR"network-snapshot-* | head -1)
echo "resuming from $SNAP"
# max-steps counts steps of THIS invocation — run the remainder
python -m nerffaceediting_tpu.apps.train $COMMON --max-steps "$((S2 - S1))" --resume "$SNAP"

echo "demo artifacts in $RUN_DIR (stats.jsonl, fakes*.png, snapshots)"
