#!/usr/bin/env bash
# Stage 1 launcher: one JAX process per host drives all local TPU chips
# (the torchrun-per-GPU model does not apply — SURVEY §2.3 TPU plan).
set -e
DATASET=${1:-arid-hmdb}
OUTPUT=${2:-runs/stage1/$DATASET}
shift 2 || true
python -m unite_tpu.train.run_stage1 \
  --config configs/stage1_config.yaml \
  --dataset "$DATASET" \
  --output_dir "$OUTPUT" \
  "$@"
