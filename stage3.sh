#!/usr/bin/env bash
# Stage 3 launcher: one JAX process per host drives all local TPU chips
# (the torchrun-per-GPU model does not apply — SURVEY §2.3 TPU plan).
# CLI overrides mirror the reference's stage3.sh:20-42 run-scale values
# (epochs 20, warmup 4, batch 5/chip, clip_threshold 0.1).
# The clip_matchORconf strategy needs CLIP text artifacts — pass
# --clip_text_features <features.npy> (see tools/extract_clip.py).
set -e
DATASET=${1:-arid-hmdb}
OUTPUT=${2:-runs/stage3/$DATASET}
shift 2 || true
CKPT_PATH=${CKPT_PATH:-runs/stage2/arid-hmdb/checkpoint-latest.msgpack}
EPOCHS=${EPOCHS:-20}
python -m unite_tpu.train.run_stage3 \
  --config configs/stage3_config.yaml \
  --dataset "$DATASET" \
  --output_dir "$OUTPUT" \
  --student_init "$CKPT_PATH" \
  --clip_threshold 0.1 \
  --epochs "$EPOCHS" \
  --warmup_epochs $((EPOCHS / 5)) \
  --batch_size 5 \
  --save_ckpt_freq 10 \
  --checkpoints_enabled true \
  --num_workers 6 \
  --initial_validation true \
  --seed 0 \
  "$@"
