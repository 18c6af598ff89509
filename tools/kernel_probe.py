#!/usr/bin/env python
"""Micro-benchmarks for the Pallas attention kernels at workload shapes.

Times the fused-qkv forward/backward and grouped kernels at the three
shapes the stage-1 step uses:

  teacher: [B*T=192, 197, 12 heads x 64]   (fwd only, 24 clips)
  student: [B=24, 314, 12 x 64]            (fwd + bwd)

Run: python tools/kernel_probe.py [B]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from unite_tpu.ops.attention import fused_qkv_attention

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    heads, d = 12, 64
    scale = d ** -0.5

    for tag, b, s, bwd in (("teacher", B * 8, 197, False),
                           ("student", B, 314, True)):
        qkv = jax.random.normal(jax.random.PRNGKey(0), (b, s, 3 * heads * d),
                                jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), (b, s, heads * d),
                              jnp.bfloat16)

        fwd = jax.jit(functools.partial(fused_qkv_attention,
                                        heads=heads, scale=scale))
        dt = timeit(fwd, qkv)
        print(f"{tag} fwd  [{b},{s}]: {dt*1e6:9.1f} us/layer "
              f"({dt*1e3*12:6.2f} ms/12 layers)")

        if bwd:
            # grad-only: with custom_vjp the primal output is dead under
            # jax.grad and XLA DCEs the forward kernel, so this times the
            # BACKWARD kernel alone
            gfn = jax.jit(jax.grad(
                lambda x: (fused_qkv_attention(x, heads, scale)
                           .astype(jnp.float32)
                           * g.astype(jnp.float32)).sum()))
            dt = timeit(gfn, qkv)
            print(f"{tag} bwd  [{b},{s}]: {dt*1e6:9.1f} us/layer "
                  f"({dt*1e3*12:6.2f} ms/12 layers)")


if __name__ == "__main__":
    main()
