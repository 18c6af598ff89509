"""Token-masking ops (device-side, jit-compatible, static shapes).

Covers the reference's three mask sources:

* attention-guided multinomial masking for stage 1
  (/root/reference/run_stage1.py:379-387: ``torch.multinomial(attn, N)``
  without replacement, keep the first N_vis draws visible). Sampling without
  replacement proportional to weights is implemented with the Gumbel top-k
  trick — distributionally identical to sequential multinomial draws, and a
  single static-shape ``top_k`` on TPU instead of a sequential sampler.
* tube / random mask generators (data-side in the reference,
  src/datasets/masking_generator.py:24-69) — provided both as host (numpy)
  and device (jnp) versions.
* greedy committee masks for stage 3 (/root/reference/src/utils.py:89-120:
  sort patches by attention descending, round-robin strided assignment of the
  top patches to k disjoint visible sets).

Convention matches the reference: mask value True/1 = MASKED, False/0 =
visible. ``visible_indices`` converts a bool mask to the gather indices the
encoder uses (order-preserving, i.e. ``x[~mask]`` semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def n_visible(num_patches: int, mask_ratio: float) -> int:
    """N_vis = N - int(N * mask_ratio) (run_stage1.py:380)."""
    return num_patches - int(num_patches * mask_ratio)


def n_visible_total(num_patches: int, frames: int, mask_ratio: float,
                    mask_type: str = "attention") -> int:
    """Static whole-video visible-token count for a mask source.

    Must use the SAME arithmetic as the mask generator, or
    ``visible_indices``'s fixed-width gather leaks masked tokens into the
    visible set: 'random' draws int(ratio·N_total) masked tokens over the
    whole video (masking_generator.py:48-69 — e.g. 314 visible at ratio 0.8,
    8x196), while attention/tube masks keep n_visible per FRAME
    (run_stage1.py:380, masking_generator.py:24-45 — 320 at the same
    geometry)."""
    if mask_type == "random":
        return num_patches - int(mask_ratio * num_patches)
    return n_visible(num_patches // frames, mask_ratio) * frames


def visible_indices(mask: jnp.ndarray, n_vis: int) -> jnp.ndarray:
    """Indices of the False (visible) entries of ``mask`` in original order.

    mask: bool [..., N]; returns int32 [..., n_vis]. Stable sort keeps the
    relative order of visible tokens, matching torch's ``x[~mask]`` gather.
    """
    order = jnp.argsort(mask.astype(jnp.int32), axis=-1, stable=True)
    return order[..., :n_vis]


def attention_multinomial_mask(rng, attn: jnp.ndarray, mask_ratio: float):
    """Teacher-attention-guided mask: keep N_vis tokens ∝ attention.

    attn: [BT, N] nonnegative attention weights (teacher CLS->patch probs).
    Returns bool mask [BT, N] with True = masked.

    Gumbel top-k == multinomial sampling without replacement ∝ attn
    (keys g_i = log w_i + Gumbel(0,1); descending order of g is a sample of
    sequential draws without replacement).
    """
    bt, n = attn.shape
    nv = n_visible(n, mask_ratio)
    logw = jnp.log(jnp.maximum(attn.astype(jnp.float32), 1e-30))
    g = jax.random.gumbel(rng, (bt, n), dtype=jnp.float32)
    keys = logw + g
    _, vis_idx = jax.lax.top_k(keys, nv)  # [BT, nv]
    mask = jnp.ones((bt, n), dtype=bool)
    mask = jax.vmap(lambda m, i: m.at[i].set(False))(mask, vis_idx)
    return mask


def greedy_committee_masks(attn: jnp.ndarray, mask_ratio: float, k: int):
    """k disjoint high-attention visible sets (reference utils.py:89-120).

    attn: [BT, N]. Returns bool [k, BT, N], True = masked. Member i unmasks
    the descending-attention-sorted patches at positions i, i+k, i+2k, ...
    (first N_unmask of that stride slice).
    """
    bt, n = attn.shape
    n_unmask = n - int(n * mask_ratio)
    order = jnp.argsort(-attn, axis=-1)  # descending
    masks = []
    for i in range(k):
        unmask_idx = order[:, i::k][:, :n_unmask]
        m = jnp.ones((bt, n), dtype=bool)
        m = jax.vmap(lambda mm, ii: mm.at[ii].set(False))(m, unmask_idx)
        masks.append(m)
    return jnp.stack(masks)


def frame_mask_to_video(mask_bt: jnp.ndarray, batch: int) -> jnp.ndarray:
    """[B*T, N] per-frame mask -> [B, T*N] per-video mask (run_stage1.py:387)."""
    return mask_bt.reshape(batch, -1)


# ---------------------------------------------------------------------------
# Host-side generators (data pipeline; parity with masking_generator.py)
# ---------------------------------------------------------------------------


class TubeMaskingGenerator:
    """Same random per-frame mask tiled across frames (masking_generator.py:24-45)."""

    def __init__(self, input_size, mask_ratio):
        self.frames, self.height, self.width = input_size
        self.num_patches_per_frame = self.height * self.width
        self.num_masks_per_frame = int(mask_ratio * self.num_patches_per_frame)
        self.total_patches = self.frames * self.num_patches_per_frame
        self.total_masks = self.frames * self.num_masks_per_frame

    def __repr__(self):
        return "Tube masking: total {}, mask {}".format(
            self.total_patches, self.total_masks
        )

    def __call__(self, rng=None):
        rng = rng if rng is not None else np.random.default_rng()
        # uniform random subset: patch i masked iff its permuted rank falls
        # in the first num_masks slots
        per_frame = (
            rng.permutation(self.num_patches_per_frame)
            < self.num_masks_per_frame
        ).astype(np.float64)
        return np.tile(per_frame, (self.frames, 1)).flatten()


class RandomMaskingGenerator:
    """IID mask over all T*H*W patches (masking_generator.py:48-69)."""

    def __init__(self, input_size, mask_ratio):
        if not isinstance(input_size, tuple):
            input_size = (input_size,) * 3
        self.frames, self.height, self.width = input_size
        self.num_patches = self.frames * self.height * self.width
        self.num_mask = int(mask_ratio * self.num_patches)

    def __repr__(self):
        return "Random masking: total {}, mask {}".format(
            self.num_patches, self.num_mask
        )

    def __call__(self, rng=None):
        rng = rng if rng is not None else np.random.default_rng()
        return (rng.permutation(self.num_patches) < self.num_mask).astype(
            np.float64)
