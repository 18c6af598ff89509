#!/usr/bin/env python
"""Does int8 buy 2x on the v5e MXU for the teacher's matmul shapes?

Times, at the stage-1 teacher MLP shape (24 clips x 8 frames x 197 tokens):

  bf16                 — baseline dot
  int8-static          — both operands pre-quantized (pure MXU rate)
  int8-dynamic         — per-token activation quant + int8 dot + dequant
                         (the real pipeline: quantize cost included)

Run: python tools/quant_probe.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    n, k, m = 24 * 8 * 197, 768, 3072
    flops = 2 * n * k * m
    x = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, m), jnp.bfloat16)
    x8 = jax.random.randint(jax.random.PRNGKey(2), (n, k), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.PRNGKey(3), (k, m), -127, 127, jnp.int8)
    w_scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (m,),
                                        jnp.float32)) + 0.01

    @jax.jit
    def f_bf16(x, w):
        return jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @jax.jit
    def f_int8(x8, w8):
        return jax.lax.dot(x8, w8, preferred_element_type=jnp.int32)

    @jax.jit
    def f_int8_dyn(x, w8, w_scale):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        acc = jax.lax.dot(xq, w8, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * s * w_scale[None, :]

    for tag, fn, args in (("bf16      ", f_bf16, (x, w)),
                          ("int8-stat ", f_int8, (x8, w8)),
                          ("int8-dyn  ", f_int8_dyn, (x, w8, w_scale))):
        dt = timeit(fn, *args)
        print(f"{tag} [{n}x{k}x{m}]: {dt*1e6:9.1f} us   "
              f"{flops/dt/1e12:7.1f} TFLOP/s-equiv")


if __name__ == "__main__":
    main()
