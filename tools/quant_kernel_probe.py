#!/usr/bin/env python
"""Can a Pallas int8 matmul kernel reach the v5e's 394 TOPS int8 MXU rate?

XLA's dot_general(int8, int8)->int32 measured only ~136 TF/s-equiv
(tools/quant_probe.py) vs 118 for bf16 — this probes whether Mosaic's MXU
path does better before committing to an int8 teacher. Blocked [M,K]x[K,N]
kernel, K resident, fp32 dequant fused on the output tile.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _mm_kernel(x_ref, w_ref, o_ref, *, out_dtype):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = acc.astype(out_dtype)


def int8_matmul(x8, w8, bm=512, bn=1024):
    m, k = x8.shape
    _, n = w8.shape
    return pl.pallas_call(
        functools.partial(_mm_kernel, out_dtype=jnp.int32),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + 4 * m * n,
            transcendentals=0,
        ),
    )(x8, w8)


def _mm_bf16_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def bf16_matmul(x, w, bm=512, bn=1024):
    m, k = x.shape
    _, n = w.shape
    return pl.pallas_call(
        _mm_bf16_kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=2 * (m * k + k * n + m * n),
            transcendentals=0,
        ),
    )(x, w)


def timeit(fn, *args, iters=50):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    m, k, n = 38400, 768, 3072  # teacher MLP rows rounded to 512
    flops = 2 * m * k * n
    x8 = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127, jnp.int8)
    x = jax.random.normal(jax.random.PRNGKey(2), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (k, n), jnp.bfloat16)

    dt = timeit(jax.jit(bf16_matmul), x, w)
    print(f"pallas bf16 [{m}x{k}x{n}]: {dt*1e6:9.1f} us  "
          f"{flops/dt/1e12:6.1f} TF/s")
    dt = timeit(jax.jit(int8_matmul), x8, w8)
    print(f"pallas int8 [{m}x{k}x{n}]: {dt*1e6:9.1f} us  "
          f"{flops/dt/1e12:6.1f} TOP/s")


if __name__ == "__main__":
    main()
