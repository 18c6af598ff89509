#!/usr/bin/env python
"""Headline benchmark: stage-1 UMT pre-training clips/sec/chip.

The BASELINE.md north star: ViT-B/16 student (mask_ratio 0.8, 8x224^2 frames,
tubelet 1 -> 1568 patches, 314 visible) + frozen CLIP-B/16 teacher, one fused
jitted train step (teacher fwd + masking + student fwd/bwd + adamw update).
Measured on the real TPU chip with device-resident batches (the input
pipeline streams ahead in training; this measures the compute ceiling).

vs_baseline is achieved/speed-of-light on the chip's bf16 peak, where
speed-of-light = peak_flops / analytic_flops_per_clip (the reference
publishes no throughput — BASELINE.md derivation).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the fused stage-1 step is a large program and
# XLA compilation through the remote-device tunnel is slow; cache it across
# runs so the bench measures steps, not compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def flops_per_clip(frames=8, img=224, patch=16, mask_ratio=0.8,
                   depth=12, dim=768, k_decoders=6, clip_dim=512):
    """Analytic FLOPs for one clip of the stage-1 step (matmul terms only)."""
    hw = (img // patch) ** 2          # 197-1 per frame for teacher, 196
    n_full = frames * hw              # 1568 student patches (tubelet 1)
    n_vis = n_full - int(n_full * mask_ratio)  # 314
    t_seq = hw + 1                    # teacher per-frame tokens (CLS)

    def block_flops(n, d):
        # qkv + proj + mlp(4x) matmuls: 2*n*d*(3d) + 2*n*d*d + 2*2*n*d*4d
        mm = 2 * n * d * (3 * d) + 2 * n * d * d + 2 * (2 * n * d * 4 * d)
        attn = 2 * 2 * n * n * d  # QK^T + PV
        return mm + attn

    teacher = frames * depth * block_flops(t_seq, dim)          # fwd only
    teacher += frames * 2 * t_seq * dim * clip_dim              # proj
    student_fwd = depth * block_flops(n_vis, dim)
    student_fwd += 2 * n_vis * (patch * patch * 3) * dim        # patch embed
    student_fwd += k_decoders * 2 * n_vis * dim * clip_dim      # decoders
    # bwd ~ 2x fwd for the student (params get grads), teacher fwd-only
    return teacher + 3 * student_fwd


def peak_bf16_flops():
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    # bf16 peak per chip: v5e 197 TFLOPS, v5p 459, v4 275, v6e ~918
    table = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
             "v4": 275e12, "v6e": 918e12, "v6 lite": 918e12}
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12


def main():
    from unite_tpu import create_model
    from unite_tpu.engines.pretrain_umt import make_pretrain_train_step
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    frames, img, mask_ratio = 8, 224, 0.8
    n_patch = frames * (img // 16) ** 2
    n_vis = n_patch - int(n_patch * mask_ratio)

    student = create_model(
        "adaptation_umt_base_patch16_224", num_frames=frames, tubelet_size=1,
        clip_return_layers=(6, 7, 8, 9, 10, 11), dtype=jnp.bfloat16,
    )
    teacher = create_model(
        "clip_b16", return_attn=True, return_index=(6, 7, 8, 9, 10, 11),
        dtype=jnp.bfloat16,
    )
    videos = jax.device_put(jnp.zeros((B, frames, img, img, 3), jnp.bfloat16))
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    sp = student.init(
        jax.random.PRNGKey(1), videos[:1], jnp.zeros((1, n_vis), jnp.int32), True
    )["params"]
    tx, _ = create_optimizer("adamw", lr=1.5e-4, params=sp, weight_decay=0.05)
    state = TrainState.create(sp, tx)
    step = jax.jit(
        make_pretrain_train_step(
            student, teacher, num_patches=n_patch, frames=frames,
            mask_ratio=mask_ratio, source_batch_size=0,
            clip_loss_data="target", clip_grad=None,
        ),
        donate_argnums=(0,),
    )
    batch = {"videos": videos}
    rng = jax.random.PRNGKey(2)

    # NOTE: on the axon-tunneled device block_until_ready can return before
    # execution completes; a D2H value read (float()) is the only reliable
    # synchronization, so we time with a scalar readback at the fence.
    state, m = step(state, tp, batch, rng)
    float(m["loss"])  # compile fence
    state, m = step(state, tp, batch, rng)
    float(m["loss"])  # warm fence

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, tp, batch, rng)
    float(m["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = B * iters / dt
    sol = peak_bf16_flops() / flops_per_clip()
    print(json.dumps({
        "metric": "stage1_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / sol, 4),
    }))


if __name__ == "__main__":
    main()
