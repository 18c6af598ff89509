"""Pallas kernel math on CPU via interpret mode.

The CPU suite normally dispatches attention to the XLA fallback, so a bug
in kernel code would only surface on an on-chip ``bench.py --check`` run.
These tests emulate every kernel regime (grouped, blocked flash, short
fused-qkv, packed long-seq flash) with ``pallas_call(interpret=True)`` and
pin fwd+grad parity against ``attention_xla`` at fp32 tolerance.  Interpret
mode does NOT check Mosaic layout/VMEM legality — that stays with the
on-TPU check (bench.py --check at the five supported shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import unite_tpu.ops.attention as A

SCALE = 64 ** -0.5


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(A, "_on_tpu", lambda: True)


def _qkv(shape, n=3, seed=0):
    return tuple(
        jax.random.normal(jax.random.PRNGKey(seed + i), shape, jnp.float32)
        for i in range(n))


def _ref_packed(x, heads):
    b, s, thd = x.shape
    hd = thd // 3
    d = hd // heads
    qkv = x.reshape(b, s, 3, heads, d).transpose(2, 0, 3, 1, 4)
    o = A.attention_xla(qkv[0], qkv[1], qkv[2], scale=SCALE)
    return o.transpose(0, 2, 1, 3).reshape(b, s, hd)


def test_grouped_regime_fwd_and_grad():
    q, k, v = _qkv((2, 3, 197, 64))

    def lp(q, k, v):
        return jnp.sum(A._grouped_attention(q, k, v, SCALE) ** 2)

    def lx(q, k, v):
        return jnp.sum(A.attention_xla(q, k, v, scale=SCALE) ** 2)

    np.testing.assert_allclose(float(lp(q, k, v)), float(lx(q, k, v)),
                               rtol=1e-5)
    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_regime_fwd_and_grad():
    q, k, v = _qkv((1, 2, 256, 64), seed=3)

    def lp(q, k, v):
        return jnp.sum(A._flash_attention(q, k, v, SCALE, 128, 128) ** 2)

    def lx(q, k, v):
        return jnp.sum(A.attention_xla(q, k, v, scale=SCALE) ** 2)

    np.testing.assert_allclose(float(lp(q, k, v)), float(lx(q, k, v)),
                               rtol=1e-5)
    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_unaligned_seq_pads_queries_only():
    # 197 is not divisible by any >=64 block: exercises the q-pad fallback
    q, k, v = _qkv((1, 2, 197, 64), seed=5)
    out = A._flash_attention(q, k, v, SCALE, 128, 128)
    ref = A.attention_xla(q, k, v, scale=SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_qkv_short_regime_fwd_and_grad():
    (x,) = _qkv((2, 197, 3 * 128), n=1, seed=7)

    def lp(x):
        return jnp.sum(A.fused_qkv_attention(x, 2, SCALE) ** 2)

    def lx(x):
        return jnp.sum(_ref_packed(x, 2) ** 2)

    np.testing.assert_allclose(float(lp(x)), float(lx(x)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(lp)(x)),
                               np.asarray(jax.grad(lx)(x)), atol=2e-4)


def test_packed_flash_long_regime_fwd_and_grad():
    # S=256 > FUSED_QKV_FWD_MAX_SEQ is not true in general; drive the packed
    # kernels directly (their dispatch threshold is an on-chip tuning fact)
    (x,) = _qkv((2, 256, 3 * 128), n=1, seed=9)
    out, lse = A._packed_flash_fwd(x, 2, SCALE)
    ref = _ref_packed(x, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g = jax.random.normal(jax.random.PRNGKey(11), out.shape, jnp.float32)
    dqkv = A._packed_flash_bwd(x, out, lse, g, 2, SCALE)
    gref = jax.grad(lambda x: jnp.sum(_ref_packed(x, 2) * g))(x)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(gref), atol=2e-4)


def test_packed_flash_odd_batch_pads_to_gb():
    (x,) = _qkv((3, 256, 3 * 128), n=1, seed=13)  # b=3 with fwd gb=2
    out, lse = A._packed_flash_fwd(x, 2, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_packed(x, 2)),
                               atol=2e-5)
    assert out.shape[0] == 3 and lse.shape[0] == 3


def test_multi_head_attention_dispatch_uses_kernels():
    # with use_pallas=True forced, both regimes route through pallas and
    # still match the XLA path bit-for-tolerance
    for seq in (197, 640):
        q, k, v = _qkv((1, 2, seq, 64), seed=seq)
        out = A.multi_head_attention(q, k, v, use_pallas=True)
        ref = A.attention_xla(q, k, v, scale=SCALE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


@pytest.mark.slow
def test_dispatch_fuzz_across_regime_boundaries():
    """Fuzz multi_head_attention across sequence lengths straddling every
    regime boundary (grouped <=512, flash >512, packed divisor vs padded
    non-divisor) and odd batches: fwd AND input grads match attention_xla.
    Interpret mode checks the math only; Mosaic legality stays with the
    on-TPU bench --check."""
    rng = np.random.default_rng(0)
    # regime map: <=512 grouped; >512 flash (divisor seq -> packed path
    # when qkv-packed entry is used; here the q/k/v API exercises
    # _flash_attention incl. the pad-to-block path at non-divisors)
    seqs = [64, 196, 197, 511, 512, 513, 577, 784, 900, 1568]
    for seq in seqs:
        b = int(rng.integers(1, 4))
        q, k, v = _qkv((b, 2, seq, 64), seed=seq)

        def lp(q, k, v):
            return jnp.sum(A.multi_head_attention(q, k, v,
                                                  use_pallas=True) ** 2)

        def lx(q, k, v):
            return jnp.sum(A.attention_xla(q, k, v, scale=SCALE) ** 2)

        np.testing.assert_allclose(float(lp(q, k, v)), float(lx(q, k, v)),
                                   rtol=2e-5, err_msg=f"fwd seq={seq}")
        gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
        for name, a, c in zip("qkv", gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=3e-4,
                err_msg=f"grad d{name} seq={seq}")
