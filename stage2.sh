#!/usr/bin/env bash
# Stage 2 launcher: one JAX process per host drives all local TPU chips
# (the torchrun-per-GPU model does not apply — SURVEY §2.3 TPU plan).
# CLI overrides mirror the reference's stage2.sh:19-37 run-scale values
# (epochs 50, warmup 10, batch 7/chip, unfrozen backbone, eval every 5).
set -e
DATASET=${1:-arid-hmdb}
OUTPUT=${2:-runs/stage2/$DATASET}
shift 2 || true
CKPT_PATH=${CKPT_PATH:-runs/stage1/hmdb_sourceonly/checkpoint-latest.msgpack}
EPOCHS=${EPOCHS:-50}
python -m unite_tpu.train.run_stage2 \
  --config configs/stage2_config.yaml \
  --dataset "$DATASET" \
  --output_dir "$OUTPUT" \
  --finetune "$CKPT_PATH" \
  --frozen_layers '' \
  --freeze_patch_embedding false \
  --warmup_epochs $((EPOCHS / 5)) \
  --epochs "$EPOCHS" \
  --batch_size 7 \
  --eval_freq 5 \
  --save_ckpt true \
  --seed 0 \
  "$@"
