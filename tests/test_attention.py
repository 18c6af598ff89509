"""Attention op tests: XLA path numerics + gradient; Pallas path is
exercised on TPU only (CPU runs use the XLA fallback by design)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.ops.attention import attention_xla, multi_head_attention


def naive_attention(q, k, v, scale):
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v), p


@pytest.mark.parametrize("seq", [17, 128, 197])
def test_xla_attention_matches_naive(seq):
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((2, 3, seq, 16), np.float32) for _ in range(3))
    scale = 16**-0.5
    out = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale, use_pallas=False
    )
    expect, _ = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5)


def test_return_probs():
    rng = np.random.default_rng(1)
    q, k, v = (rng.standard_normal((1, 2, 9, 8), np.float32) for _ in range(3))
    scale = 8**-0.5
    out, probs = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        scale=scale, return_probs=True, use_pallas=False,
    )
    _, p_expect = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(probs), p_expect, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_xla_attention_grad_finite():
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 33, 8), np.float32))
               for _ in range(3))

    def loss(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_flash_qblock_always_divides():
    """A non-dividing block_q would silently truncate the Pallas grid tail;
    _flash_qblock must return a (padded_len, block) pair whose block divides
    the padded length exactly, for ANY requested block_q and length —
    preferring an exact divisor of S (no padding) when one exists."""
    from unite_tpu.ops.attention import _flash_qblock

    for s in (513, 577, 640, 784, 1000, 1568, 1577, 4096):
        for req in (96, 128, 224, 256, 1024):
            s_pad, bq = _flash_qblock(s, req)
            assert s_pad >= s and s_pad % bq == 0 and bq % 8 == 0, (s, req)
    # the stage-2/784-token shapes must take the unpadded exact-divisor path
    assert _flash_qblock(1568, 128) == (1568, 224)
    assert _flash_qblock(784, 128) == (784, 112)
    # no usable divisor (prime-ish) → padded to a 128 multiple
    assert _flash_qblock(577, 128) == (640, 128)


def test_bf16_attention_close():
    rng = np.random.default_rng(3)
    q, k, v = (rng.standard_normal((1, 2, 64, 32), np.float32) for _ in range(3))
    out32 = multi_head_attention(*(jnp.asarray(x) for x in (q, k, v)), use_pallas=False)
    outbf = multi_head_attention(
        *(jnp.asarray(x, jnp.bfloat16) for x in (q, k, v)), use_pallas=False
    )
    np.testing.assert_allclose(
        np.asarray(outbf, np.float32), np.asarray(out32), atol=3e-2
    )
