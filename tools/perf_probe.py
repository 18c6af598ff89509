#!/usr/bin/env python
"""Component-level step budget for the stage-1 bench workload (real TPU).

Times, at the bench shapes (B clips, 8x224^2, ViT-B student mask 0.8,
CLIP-B/16 teacher with 6 taps):

  teacher   — frozen teacher forward (taps z + last-layer attention)
  teacher_notap — teacher forward returning only attention (isolates the
                  ln_post+proj+L2 tap post-processing cost)
  student   — student fwd+bwd+adamw given fixed vis_idx
  step      — the full fused train step (bench.py workload)

Run: python tools/perf_probe.py [B]. Prints one line per component.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # tunneled device: a scalar readback is the only reliable fence
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from unite_tpu import create_model
    from unite_tpu.engines.pretrain_umt import make_pretrain_train_step
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    frames, img, mask_ratio = 8, 224, 0.8
    n_patch = frames * (img // 16) ** 2
    # per-frame masking like the engine: 8 x (196 - int(196*0.8)) = 320
    # visible tokens (NOT int(1568*0.8) = 314)
    ppf = (img // 16) ** 2
    n_vis = (ppf - int(ppf * mask_ratio)) * frames

    student = create_model(
        "adaptation_umt_base_patch16_224", num_frames=frames, tubelet_size=1,
        clip_return_layers=(6, 7, 8, 9, 10, 11), dtype=jnp.bfloat16,
    )
    teacher = create_model(
        "clip_b16", return_attn=True, return_index=(6, 7, 8, 9, 10, 11),
        dtype=jnp.bfloat16,
    )
    teacher_notap = create_model(
        "clip_b16", return_attn=True, return_index=(11,),
        dtype=jnp.bfloat16,
    )
    videos = jax.device_put(jnp.zeros((B, frames, img, img, 3), jnp.bfloat16))
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    sp = student.init(
        jax.random.PRNGKey(1), videos[:1], jnp.zeros((1, n_vis), jnp.int32),
        True,
    )["params"]
    tx, _ = create_optimizer("adamw", lr=1.5e-4, params=sp, weight_decay=0.05)
    state = TrainState.create(sp, tx)
    vis_idx = jax.device_put(
        jnp.tile(jnp.arange(n_vis, dtype=jnp.int32)[None], (B, 1)))
    targets = jax.device_put(
        jnp.zeros((6, B, n_vis, 512), jnp.bfloat16))

    t_fn = jax.jit(lambda p, v: teacher.apply({"params": p}, v))
    dt = timeit(t_fn, tp, videos)
    print(f"teacher        B={B}: {dt*1e3:8.2f} ms  ({B/dt:7.1f} clips/s)")

    tnt_fn = jax.jit(lambda p, v: teacher_notap.apply({"params": p}, v))
    dt = timeit(tnt_fn, tp, videos)
    print(f"teacher_1tap   B={B}: {dt*1e3:8.2f} ms  ({B/dt:7.1f} clips/s)")

    from unite_tpu.engines.losses import clip_alignment_loss

    def student_loss(params, v, vi, tgt, rng):
        x_clip = student.apply({"params": params}, v, vi, True, False,
                               rngs={"dropout": rng})
        return clip_alignment_loss(x_clip, tgt, "l2")

    @jax.jit
    def student_step(st, v, vi, tgt, rng):
        loss, grads = jax.value_and_grad(student_loss)(st.params, v, vi,
                                                       tgt, rng)
        return st.apply_gradients(grads), loss

    rng = jax.random.PRNGKey(2)
    dt = timeit(lambda: student_step(state, videos, vis_idx, targets, rng))
    print(f"student+opt    B={B}: {dt*1e3:8.2f} ms  ({B/dt:7.1f} clips/s)")

    step = jax.jit(
        make_pretrain_train_step(
            student, teacher, num_patches=n_patch, frames=frames,
            mask_ratio=mask_ratio, source_batch_size=0,
            clip_loss_data="target", clip_grad=None,
        ),
    )
    batch = {"videos": videos}
    dt = timeit(lambda: step(state, tp, batch, rng))
    print(f"full step      B={B}: {dt*1e3:8.2f} ms  ({B/dt:7.1f} clips/s)")


if __name__ == "__main__":
    main()
