#!/usr/bin/env bash
# Stage 1 launcher: one JAX process per host drives all local TPU chips
# (the torchrun-per-GPU model does not apply — SURVEY §2.3 TPU plan).
# CLI overrides mirror the reference's stage1.sh:18-33 run-scale values
# (epochs 100, warmup 10, batch 64/chip, UMT-K710 student init).
set -e
DATASET=${1:-hmdb_sourceonly}
OUTPUT=${2:-runs/stage1/$DATASET}
shift 2 || true
INIT_CKPT_DIR=${INIT_CKPT_DIR:-checkpoints/}
python -m unite_tpu.train.run_stage1 \
  --config configs/stage1_config.yaml \
  --dataset "$DATASET" \
  --output_dir "$OUTPUT" \
  --clip_loss_data source \
  --clip_decoder_init "${INIT_CKPT_DIR}b16_ptk710_f8_res224.pth" \
  --student_init "${INIT_CKPT_DIR}b16_ptk710_f8_res224.pth" \
  --epochs 100 \
  --warmup_epochs 10 \
  --batch_size 64 \
  --save_ckpt_freq 50 \
  --checkpoints_enabled true \
  --num_workers 10 \
  --seed 0 \
  "$@"
