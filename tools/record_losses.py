#!/usr/bin/env python
"""Record a deterministic stage-1 loss curve for cross-framework parity.

BASELINE.md's parity protocol: given identical masks, the TPU build and the
PyTorch reference must produce matching loss curves. This tool fixes
everything stochastic — synthetic video generated from a seed, masks drawn
host-side and injected via the batch ``vis_idx`` hook — runs N steps, and
writes one JSON line per step. Run the sibling procedure on the reference
(same seeds/masks exported via --dump-masks) and diff the curves.

Usage:
  python tools/record_losses.py out.jsonl --steps 20 --batch 4 \
      [--student-init b16.pth --clip-init vit_b16.pth] [--dump-masks m.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--mask-ratio", type=float, default=0.8)
    ap.add_argument("--lr", type=float, default=1.5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--student-init", default="")
    ap.add_argument("--clip-init", default="")
    ap.add_argument("--dump-masks", default="",
                    help="also save the drawn masks/videos for the reference run")
    args = ap.parse_args()

    from unite_tpu import create_model
    from unite_tpu.engines.pretrain_umt import make_pretrain_train_step
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState
    from unite_tpu.utils import torch_import as ti

    frames, img = args.frames, 224
    n_patch = frames * (img // 16) ** 2
    n_vis = n_patch - int(n_patch * args.mask_ratio)

    student = create_model(
        "adaptation_umt_base_patch16_224", num_frames=frames, tubelet_size=1,
        clip_return_layers=(6, 7, 8, 9, 10, 11), dtype=jnp.bfloat16,
    )
    teacher = create_model(
        "clip_b16", return_attn=True, return_index=(6, 7, 8, 9, 10, 11),
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(args.seed)
    videos = rng.standard_normal(
        (args.steps, args.batch, frames, img, img, 3)).astype(np.float32) * 0.5
    masks = np.stack([
        np.stack([rng.permutation(n_patch)[:n_vis] for _ in range(args.batch)])
        for _ in range(args.steps)
    ]).astype(np.int32)
    masks.sort(axis=-1)  # order-preserving gather like x[~mask]

    if args.dump_masks:
        np.savez(args.dump_masks, videos=videos, vis_idx=masks)

    example = jnp.zeros((1, frames, img, img, 3), jnp.bfloat16)
    sp = student.init(jax.random.PRNGKey(args.seed), example,
                      jnp.zeros((1, n_vis), jnp.int32), True)["params"]
    tp = teacher.init(jax.random.PRNGKey(args.seed + 1), example)["params"]
    if args.student_init:
        state = ti.load_torch_state(args.student_init)
        state = ti.wrap_encoder_prefix(state)
        sp, _, _ = ti.merge_params(sp, ti.state_to_flax_params(state),
                                   strict_shapes=False)
    if args.clip_init:
        state = ti.load_torch_state(args.clip_init, "model|module|state_dict")
        tp, _, _ = ti.merge_params(
            tp, ti.clip_state_to_flax_params(state), strict_shapes=False)

    tx, _ = create_optimizer("adamw", lr=args.lr, params=sp, weight_decay=0.05)
    st = TrainState.create(sp, tx)
    step = jax.jit(make_pretrain_train_step(
        student, teacher, num_patches=n_patch, frames=frames,
        mask_ratio=args.mask_ratio, source_batch_size=0,
        clip_loss_data="mixed",
    ), donate_argnums=(0,))

    with open(args.out, "w") as f:
        for i in range(args.steps):
            batch = {"videos": jnp.asarray(videos[i]),
                     "vis_idx": jnp.asarray(masks[i])}
            st, m = step(st, tp, batch, jax.random.PRNGKey(0))
            rec = {"step": i, "loss": float(m["loss"]),
                   "grad_norm": float(m["grad_norm"])}
            f.write(json.dumps(rec) + "\n")
            print(rec)


if __name__ == "__main__":
    main()
