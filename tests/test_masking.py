"""Tests for the masking ops (attention multinomial, committee, generators)."""

import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.ops.masking import (
    RandomMaskingGenerator,
    TubeMaskingGenerator,
    attention_multinomial_mask,
    frame_mask_to_video,
    greedy_committee_masks,
    n_visible,
    visible_indices,
)


def test_n_visible():
    # N_vis = N - int(N * ratio) (run_stage1.py:380)
    assert n_visible(196, 0.8) == 196 - 156
    assert n_visible(1568, 0.8) == 1568 - 1254


def test_visible_indices_order_preserving():
    mask = jnp.array([[True, False, True, False, False]])
    idx = visible_indices(mask, 3)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 3, 4]])


def test_attention_mask_counts_and_bias():
    rng = jax.random.PRNGKey(0)
    n = 196
    bt = 64
    # peaked attention on the first 40 tokens
    attn = np.full((bt, n), 1e-4, np.float32)
    attn[:, :40] = 1.0
    mask = attention_multinomial_mask(rng, jnp.asarray(attn), 0.8)
    mask = np.asarray(mask)
    nv = n_visible(n, 0.8)
    # exact visible count per row
    np.testing.assert_array_equal((~mask).sum(-1), nv)
    # high-attention tokens should be kept far more often
    keep_hi = (~mask[:, :40]).mean()
    keep_lo = (~mask[:, 40:]).mean()
    assert keep_hi > 0.9
    assert keep_lo < 0.1


def test_attention_mask_uniform_is_unbiased():
    rng = jax.random.PRNGKey(1)
    attn = jnp.ones((512, 64))
    mask = np.asarray(attention_multinomial_mask(rng, attn, 0.5))
    keep_rate = (~mask).mean(axis=0)
    # each position kept ~50% of the time
    assert abs(keep_rate.mean() - 0.5) < 1e-6
    assert keep_rate.std() < 0.08


def test_greedy_committee_masks_disjoint_topk():
    # reference utils.py:89-120: sort by attention desc, stride-k round robin
    attn = jnp.asarray(np.random.default_rng(0).random((4, 196)).astype(np.float32))
    masks = np.asarray(greedy_committee_masks(attn, 0.8, k=2))
    assert masks.shape == (2, 4, 196)
    n_unmask = 196 - int(196 * 0.8)
    for m in masks:
        np.testing.assert_array_equal((~m).sum(-1), n_unmask)
    # disjoint visible sets
    assert not np.any(~masks[0] & ~masks[1])
    # visible tokens are the top-2*n_unmask attention patches
    order = np.argsort(-np.asarray(attn), axis=-1)
    top = order[:, : 2 * n_unmask]
    vis_union = ~masks[0] | ~masks[1]
    for b in range(4):
        assert set(np.where(vis_union[b])[0]) == set(top[b])


def test_frame_mask_to_video():
    m = jnp.arange(24).reshape(8, 3) % 2 == 0
    out = frame_mask_to_video(m, batch=2)
    assert out.shape == (2, 12)


def test_tube_masking_generator():
    gen = TubeMaskingGenerator((8, 14, 14), 0.75)
    m = gen().reshape(8, 196)
    # same mask each frame
    for t in range(1, 8):
        np.testing.assert_array_equal(m[t], m[0])
    assert m[0].sum() == int(0.75 * 196)


def test_random_masking_generator():
    gen = RandomMaskingGenerator((8, 14, 14), 0.9)
    m = gen()
    assert m.sum() == int(0.9 * 8 * 196)
    assert m.shape == (8 * 196,)


def test_n_visible_total_matches_generators():
    """The static visible count must equal what each generator leaves
    visible — 'random' counts over the whole video, tube per frame
    (masking_generator.py:24-69); a mismatch makes visible_indices leak
    masked tokens into the fixed-width gather."""
    from unite_tpu.ops.masking import n_visible_total

    for ratio in (0.75, 0.8, 0.9):
        m = RandomMaskingGenerator((8, 14, 14), ratio)()
        assert (m == 0).sum() == n_visible_total(8 * 196, 8, ratio, "random")
        mt = TubeMaskingGenerator((8, 14, 14), ratio)()
        assert (mt == 0).sum() == n_visible_total(8 * 196, 8, ratio, "tube")
    # the whole-video and per-frame formulas genuinely differ at 0.8
    assert n_visible_total(1568, 8, 0.8, "random") == 314
    assert n_visible_total(1568, 8, 0.8, "attention") == 320
