#!/usr/bin/env python
"""Stage-2 dense-stack decomposition probe (VERDICT r4 item 3).

Times the full fine-tune step against surgical variants to attribute the
~5 ms gap between the measured no-attention step (43.8 ms at B=8) and the
practical matmul bound (~39 ms):

  base    the exact bench --stage2 step (adamw + grad-norm metric)
  noopt   loss+grads only, no optimizer update / param write
  nonorm  full step but without the global grad-norm metric
  sgdopt  update via plain SGD (minimal optimizer state traffic)
  mubf16  adamw with the first moment stored bf16 (halves m traffic)
  mvbf16  adamw with BOTH moments bf16
  gradbf16 grads cast bf16 before clip+update (halves grad read)

Usage:  python tools/stage2_probe.py base noopt ...   (each compiles once,
persistent cache makes re-runs fast). Prints ms/step per variant.
``--stage3`` probes the self-training step instead (variants: base,
sgdopt — the update traffic question is the same; the rest of that step
is attention+matmuls already decomposed by DESIGN.md).
``--large`` probes the ViT-L fine-tune step (bench --large2: 1024x24,
heads 16, B=8) — VERDICT r5 item 3: same surgical variants, plus
``xlaattn`` (use_pallas=False: packed-kernel win/loss at L width) and
``remat`` (use_checkpoint: trade recompute for VMEM/HBM pressure).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, FRAMES, IMG = 8, 8, 224
LARGE = False


def build_stage3(variant: str):
    import flax.linen as nn

    from unite_tpu import create_model
    from unite_tpu.engines.selftrain import make_selftrain_step
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState

    mask_ratio = 0.8
    n_patch = FRAMES * (IMG // 16) ** 2
    student = create_model(
        "adaptation_umt_base_patch16_224", num_frames=FRAMES, tubelet_size=1,
        clip_return_layers=(6,), dtype=jnp.bfloat16)
    classifier = nn.Dense(12, param_dtype=jnp.float32, dtype=jnp.float32)
    teacher = create_model("clip_b16", return_attn=True, return_index=(6,),
                           dtype=jnp.bfloat16)
    videos = jax.device_put(jnp.zeros((B, FRAMES, IMG, IMG, 3), jnp.bfloat16))
    labels = jax.device_put(jnp.zeros((B,), jnp.int32))
    clip_sim = jax.device_put(jnp.full((B, 12), 1.0 / 12, jnp.float32))
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    sp = student.init(jax.random.PRNGKey(1), videos[:1])["params"]
    hp = classifier.init(jax.random.PRNGKey(2),
                         jnp.zeros((1, 768), jnp.float32))["params"]
    params = {"model": sp, "classifier": hp}
    if variant == "sgdopt":
        tx = optax.sgd(1e-5)
    elif variant == "mubf16":
        tx, _ = create_optimizer("adamw", lr=1e-5, params=params,
                                 weight_decay=0.05, mu_dtype=jnp.bfloat16)
    else:
        tx, _ = create_optimizer("adamw", lr=1e-5, params=params,
                                 weight_decay=0.05)
    state = TrainState.create(params, tx)
    step = make_selftrain_step(
        student, classifier, teacher, num_patches=n_patch, frames=FRAMES,
        mask_ratio=mask_ratio, selection_strategy="clip_matchORconf")
    batch = {"videos_s": videos, "labels_s": labels, "videos_t": videos,
             "labels_t": labels, "clip_sim": clip_sim}
    jitted = jax.jit(step, donate_argnums=(0,))

    def stepper(state, b, rng):
        return jitted(state, tp, b, rng)

    return stepper, state, batch


def build(variant: str):
    from unite_tpu import create_model
    from unite_tpu.engines.finetune import make_finetune_train_step
    from unite_tpu.engines.losses import accuracy_topk, cross_entropy
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState, clip_by_global_norm

    name = "vit_large_patch16_224" if LARGE else "vit_base_patch16_224"
    model = create_model(
        name, num_classes=12, all_frames=FRAMES,
        tubelet_size=1, dtype=jnp.bfloat16, use_mean_pooling=True,
        use_pallas=False if variant == "xlaattn" else None,
        remat=variant == "remat",
    )
    videos = jax.device_put(
        jnp.zeros((B, FRAMES, IMG, IMG, 3), jnp.bfloat16))
    labels = jax.device_put(jnp.zeros((B,), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), videos)["params"]

    if variant in ("sgdopt",):
        tx = optax.sgd(2.5e-5)
    elif variant in ("mubf16", "mvbf16"):
        nu = jnp.bfloat16 if variant == "mvbf16" else None
        # optax stores nu in param dtype; emulate bf16 nu via a cast chain
        tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                mu_dtype=jnp.bfloat16),
            optax.add_decayed_weights(0.05),
            optax.scale(-2.5e-5),
        )
        del nu  # nu dtype knob not exposed by optax; mvbf16 ~ mubf16 here
    else:
        tx, _ = create_optimizer("adamw", lr=2.5e-5, params=params,
                                 weight_decay=0.05)
    state = TrainState.create(params, tx)

    if variant == "noopt":
        def step(state, batch, rng):
            def loss_fn(p):
                logits = model.apply({"params": p}, batch["videos"], False,
                                     rngs={"dropout": rng})
                return cross_entropy(logits, batch["labels"]), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # touch every grad leaf cheaply so nothing is DCE'd
            s = sum(jnp.sum(g[..., :1].astype(jnp.float32))
                    for g in jax.tree.leaves(grads))
            return state, {"loss": loss + 0.0 * s}
    elif variant in ("nonorm", "gradbf16"):
        cast = variant == "gradbf16"

        def step(state, batch, rng):
            def loss_fn(p):
                logits = model.apply({"params": p}, batch["videos"], False,
                                     rngs={"dropout": rng})
                return cross_entropy(logits, batch["labels"]), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if cast:
                grads = jax.tree.map(
                    lambda g: g.astype(jnp.bfloat16), grads)
                grads, norm = clip_by_global_norm(grads, None)
                metrics = {"loss": loss, "grad_norm": norm}
            else:
                metrics = {"loss": loss}
            state = state.apply_gradients(grads)
            return state, metrics
    else:
        step = make_finetune_train_step(model)

    return (jax.jit(step, donate_argnums=(0,)), state,
            {"videos": videos, "labels": labels})


def run(variant: str, stage3: bool = False) -> float:
    step, state, batch = (build_stage3 if stage3 else build)(variant)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    float(m["loss"])
    print(f"  [{variant}] compile+1st: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    state, m = step(state, batch, rng)
    float(m["loss"])
    best = float("inf")
    for _ in range(2):
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, rng)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


if __name__ == "__main__":
    stage3 = "--stage3" in sys.argv
    if "--large" in sys.argv:
        LARGE = True
    for a in list(sys.argv):
        if a.startswith("--b="):
            B = int(a.split("=")[1])
    variants = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "base", "noopt", "nonorm", "sgdopt", "mubf16", "gradbf16"]
    if LARGE and len([a for a in sys.argv[1:] if not a.startswith("--")]) == 0:
        variants += ["xlaattn", "remat"]
    out = {}
    for v in variants:
        out[v] = run(v, stage3=stage3)
        print(f"{v}: {out[v]:.2f} ms/step "
              f"({B / out[v] * 1e3:.1f} clips/s)")
    if "base" in out:
        for v, ms in out.items():
            if v != "base":
                print(f"  base - {v} = {out['base'] - ms:+.2f} ms")
