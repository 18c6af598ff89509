"""Loss functions used across the three stages.

Counterparts of the reference's criterion selection (run_stage2.py:675-683:
SoftTargetCrossEntropy if mixup, LabelSmoothingCrossEntropy if smoothing>0,
else CrossEntropyLoss) and the stage-1 CLIP alignment losses
(run_stage1.py:403-438). All computed in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, label_smoothing: float = 0.0,
                  reduction: str = "mean"):
    """CE over int labels with optional smoothing (torch semantics).

    Per-sample weighting (stage-3 confidence weighting, run_stage3.py:
    608-613) is deliberately NOT a parameter: the weighted mean there
    normalizes over the *selected* samples, so callers take
    reduction='none' and apply their own weights + normalizer
    (engines/selftrain.py does exactly this).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        smooth = -logp.mean(axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def soft_target_cross_entropy(logits, soft_targets):
    """timm SoftTargetCrossEntropy: mean over batch of -sum(t * logp)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-soft_targets * logp, axis=-1))


def clip_alignment_loss(x_clip, targets, loss_type: str = "l2",
                        row_weights=None):
    """Stage-1 student→teacher alignment (run_stage1.py:403-438).

    x_clip, targets: [K, B, N_vis, C] (both L2-normalized when loss_type
    is 'l2'). 'l2' = mean over everything of (2 - 2·cos); others are plain
    elementwise regressions.

    ``row_weights``: optional [B] 0/1 weights — the mean restricts to the
    weighted rows (batch-layout-agnostic form of the reference's
    ``clip_loss_data`` source/target slicing, run_stage1.py:417-427;
    math-identical to slicing since every row has the same element count).
    """
    x = x_clip.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if loss_type == "l2":
        per = 2.0 - 2.0 * jnp.sum(x * t, axis=-1)  # [K, B, N_vis]
    elif loss_type == "mse":
        per = jnp.square(x - t)
    elif loss_type == "l1":
        per = jnp.abs(x - t)
    elif loss_type == "smooth_l1":
        d = jnp.abs(x - t)
        per = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    else:
        raise NotImplementedError(loss_type)
    if row_weights is None:
        return jnp.mean(per)
    w = row_weights.astype(jnp.float32)
    axes = tuple(i for i in range(per.ndim) if i != 1)
    row_mean = jnp.mean(per, axis=axes)  # [B]
    return jnp.sum(row_mean * w) / jnp.maximum(jnp.sum(w), 1.0)


def accuracy_topk(logits, labels, ks=(1, 5)):
    """Top-k accuracies in percent, computed on device. k is clamped to the
    class count (5-class tasks still report 'top5' = 100%)."""
    ks = [min(k, logits.shape[-1]) for k in ks]
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits.astype(jnp.float32), maxk)  # [B, maxk]
    correct = pred == labels[:, None]
    return [100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1)) for k in ks]
