#!/usr/bin/env python
"""Per-shape XLA matmul-rate table + recomputed per-mode practical ceilings.

VERDICT r4 item 4: the 0.60x "practical matmul ceiling" generalized ONE
K=768 measurement (tools/quant_probe.py) to every mode's at-cap claim. This
sweeps jax.lax.dot over the actual hot (N, K, M) GEMMs of each bench mode —
dense K in {768, 2304, 3072, 1024, 4096}, the qkv/proj/mlp shapes at each
mode's token count, the backward transposes (dX = dY @ W^T, dW = X^T @ dY),
and the batched attention logits/PV dots — then recomputes each mode's
practical ceiling as sum(flops) / sum(flops_i / rate_i) over its GEMM mix.

Run on the TPU:  python tools/matmul_rates.py          # prints table + JSON
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(3):  # best-of-3 (tunnel noise, CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# Rates are measured with R data-dependent GEMM pairs chained INSIDE one
# jitted program (x -> x@w1 -> (.)@w2 -> ...): a single dispatched dot
# through the ~30ms-RTT tunnel is floored by per-call overhead for the
# small per-step shapes (B=8 modes), which is NOT how the real fused step
# executes them. The chain reports the average rate of the (k,m)+(m,k)
# pair — both transposes appear in every mode's fwd+bwd mix anyway.
R = 8


@jax.jit
def chain2(x, w1, w2):
    for _ in range(R):
        x = jax.lax.dot(x, w1).astype(jnp.bfloat16)
        x = jax.lax.dot(x, w2).astype(jnp.bfloat16)
    return x[0, 0].astype(jnp.float32)


@jax.jit
def chain_b(q, k, v):
    for _ in range(R):
        p = jax.lax.dot_general(q, k, (((2,), (1,)), ((0,), (0,))))
        q = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,)))).astype(jnp.bfloat16)
    return q[0, 0, 0].astype(jnp.float32)


def rate2(n, k, m):
    x = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (k, m), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(2), (m, k), jnp.bfloat16) * 0.02
    dt = timeit(chain2, x, w1, w2, iters=10)
    return R * (2 * n * k * m + 2 * n * m * k) / dt


def rate_b(b, n, d, m):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, n, d), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (b, d, m), jnp.bfloat16) * 0.02
    v = jax.random.normal(jax.random.PRNGKey(2), (b, m, d), jnp.bfloat16) * 0.02
    dt = timeit(chain_b, q, kk, v, iters=10)
    return R * (2 * b * n * d * m + 2 * b * n * m * d) / dt


# GEMM mixes per mode. Tokens: stage-1 student 64x320 vis (+ teacher
# 512x197 frames), stage-2 8x1568, stage-3 (src 8 + tgt 8 full + grad
# 8x320), large (B=24 x 1568 @ 1024), large2 (B=8 @ 1024), infer 64x1568.
def dense_mix(n_tok, d, label):
    """fwd + bwd GEMMs of one transformer block's dense stack at [n_tok, d]
    (qkv, proj, mlp up/down; bwd = dX and dW transposes of each)."""
    shapes = []
    for (k, m, tag) in [(d, 3 * d, "qkv"), (d, d, "proj"),
                        (d, 4 * d, "mlp1"), (4 * d, d, "mlp2")]:
        shapes.append((f"{label}.{tag}.fwd", n_tok, k, m))
        shapes.append((f"{label}.{tag}.dx", n_tok, m, k))   # dY @ W^T
        shapes.append((f"{label}.{tag}.dw", k, n_tok, m))   # X^T @ dY
    return shapes


MODES = {
    "stage1_student": dense_mix(64 * 320, 768, "s1"),
    "stage1_teacher": [(f"s1t.{t}", 64 * 8 * 197, k, m) for (k, m, t) in
                       [(768, 2304, "qkv"), (768, 768, "proj"),
                        (768, 3072, "mlp1"), (3072, 768, "mlp2")]],
    "stage2": dense_mix(8 * 1568, 768, "s2"),
    "infer": [(f"inf.{t}", 64 * 1568, k, m) for (k, m, t) in
              [(768, 2304, "qkv"), (768, 768, "proj"),
               (768, 3072, "mlp1"), (3072, 768, "mlp2")]],
    "large_vitl": dense_mix(24 * 1568, 1024, "L"),
    "large2_vitl": dense_mix(8 * 1568, 1024, "L2"),
}

ATTN = [
    # (label, B*H, N, D, M): logits q@k^T then pv p@v
    ("s2.attn_logits", 8 * 12, 1568, 64, 1568),
    ("s2.attn_pv", 8 * 12, 1568, 1568, 64),
    ("L2.attn_logits", 8 * 16, 1568, 64, 1568),
    ("L2.attn_pv", 8 * 16, 1568, 1568, 64),
]


def main():
    from bench import peak_bf16_flops

    peak = peak_bf16_flops()
    rates = {}
    print(f"{'shape':22s} {'N':>8s} {'K':>6s} {'M':>6s} "
          f"{'TF/s':>8s} {'x nominal':>9s}")
    seen = {}
    for mode, shapes in MODES.items():
        for (label, n, k, m) in shapes:
            key = (n,) + tuple(sorted((k, m)))
            if key not in seen:
                seen[key] = rate2(n, k, m)
            r = seen[key]
            rates[label] = {"n": n, "k": k, "m": m, "tflops": r / 1e12,
                            "frac_nominal": r / peak}
            print(f"{label:22s} {n:8d} {k:6d} {m:6d} "
                  f"{r / 1e12:8.1f} {r / peak:9.3f}")
    for (label, b, n, d, m) in ATTN:
        r = rate_b(b, n, d, m)
        rates[label] = {"b": b, "n": n, "d": d, "m": m,
                        "tflops": r / 1e12, "frac_nominal": r / peak}
        print(f"{label:22s} {b:4d}x{n:<6d} {d:6d} {m:6d} "
              f"{r / 1e12:8.1f} {r / peak:9.3f}")

    # per-mode practical ceiling over its GEMM mix (harmonic-mean rate)
    print("\nper-mode practical ceilings (GEMM mix, fwd+bwd where listed):")
    ceilings = {}
    for mode, shapes in MODES.items():
        tot_f = sum(2 * n * k * m for (_, n, k, m) in shapes)
        tot_t = sum(2 * n * k * m / seen[(n,) + tuple(sorted((k, m)))]
                    for (_, n, k, m) in shapes)
        ceilings[mode] = tot_f / tot_t / peak
        print(f"  {mode:16s} {tot_f / tot_t / 1e12:6.1f} TF/s "
              f"= {ceilings[mode]:.3f} x nominal")
    out = {"peak_bf16_flops": peak, "rates": rates, "ceilings": ceilings}
    with open("MATMUL_RATES_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote MATMUL_RATES_r05.json")


if __name__ == "__main__":
    main()
