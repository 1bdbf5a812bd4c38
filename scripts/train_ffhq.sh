#!/bin/bash
# Canonical ffhq-512 training invocation (the reference's start.sh config:
# batch 32, gamma 1, pose conditioning, per-label histogram loss).
# One JAX process drives all local TPU devices; multi-host via
# jax.distributed (set JAX_COORDINATOR_ADDRESS etc. per host).
set -e
python -m nerffaceediting_tpu.apps.train \
    --data "${DATA:-ffhq512.zip}" \
    --outdir "${OUTDIR:-runs}" \
    --cfg ffhq \
    --batch 32 \
    --gamma 1 \
    --gen-pose-cond \
    --hist-type per_label \
    --face-parser "${FACE_PARSER:-79999_iter.pth}" \
    "$@"
