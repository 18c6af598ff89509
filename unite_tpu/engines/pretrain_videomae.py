"""VideoMAE pixel-reconstruction pretraining engine (legacy family).

Counterpart of /root/reference/src/engines/engine_for_pretraining.py:31-127:
targets are the un-normalized pixels of the masked patches, optionally
re-normalized per patch (mean/var over the patch's pixels, unbiased std,
eps 1e-6 — :59-70), MSE against the decoder's predictions. Patch-vector
ordering (kt, kh, kw, c) matches models/layers.PatchEmbed and the decoder
head. (The reference's copy of this engine is dead code due to a broken
import, SURVEY §2 defects list — rebuilt here as a working feature.)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unite_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from unite_tpu.train.train_state import TrainState, clip_by_global_norm


def patchify(videos, patch_size: int, tubelet_size: int):
    """[B, T, H, W, C] → [B, N, ts*p*p*C] with (kt, kh, kw, c) ordering."""
    b, t, h, w, c = videos.shape
    p, ts = patch_size, tubelet_size
    x = videos.reshape(b, t // ts, ts, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (t // ts) * (h // p) * (w // p), ts * p * p * c)


def masked_pixel_targets(videos, mask_idx, patch_size: int, tubelet_size: int,
                         normalize_target: bool = True):
    """Per-patch-normalized pixel labels of the masked tokens (:59-74)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    unnorm = videos.astype(jnp.float32) * std + mean  # back to [0, 1]
    if normalize_target:
        b, t, h, w, c = unnorm.shape
        p, ts = patch_size, tubelet_size
        x = unnorm.reshape(b, t // ts, ts, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, -1, ts * p * p, c)  # [B, N, P, C]
        mu = x.mean(axis=-2, keepdims=True)
        var = x.var(axis=-2, keepdims=True, ddof=1)  # unbiased (:67)
        x = (x - mu) / (jnp.sqrt(var) + 1e-6)
        patches = x.reshape(b, x.shape[1], -1)
    else:
        patches = patchify(unnorm, patch_size, tubelet_size)
    return jnp.take_along_axis(patches, mask_idx[..., None], axis=1)


def make_videomae_train_step(
    model,
    *,
    patch_size: int = 16,
    tubelet_size: int = 2,
    normalize_target: bool = True,
    clip_grad: Optional[float] = None,
) -> Callable:
    """Batch dict: videos [B,T,H,W,C] (ImageNet-normalized), vis_idx
    [B, N_vis], mask_idx [B, N_mask]."""

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        videos = batch["videos"]
        vis_idx, mask_idx = batch["vis_idx"], batch["mask_idx"]
        drop_rng = jax.random.fold_in(rng, state.step)

        labels = jax.lax.stop_gradient(masked_pixel_targets(
            videos, mask_idx, patch_size, tubelet_size, normalize_target))

        def loss_fn(params):
            preds = model.apply(
                {"params": params}, videos, vis_idx, mask_idx, False,
                rngs={"dropout": drop_rng},
            )
            return jnp.mean(jnp.square(preds.astype(jnp.float32) - labels))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads, grad_norm = clip_by_global_norm(grads, clip_grad)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "grad_norm": grad_norm}

    return train_step
