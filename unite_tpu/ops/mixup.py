"""Device-side Mixup / CutMix producing soft targets.

Counterpart of /root/reference/src/datasets/mixup.py:37-240 (`Mixup`,
`one_hot`, `mixup_target`, `rand_bbox`, `cutmix_bbox_and_lam`), redesigned
to run *inside the jitted train step* on TPU instead of on CPU tensors:
static shapes, explicit PRNG, cutmix boxes expressed as coordinate masks
(no dynamic slicing). Used by stage 2 (run_stage2.py:565-572; shipped
configs have mixup 0.0 but the capability is part of the surface).

Video layout [B, T, H, W, C]; the spatial box is applied to every frame
(the reference mixes [B, C, T, H, W] tensors the same way — the box spans
all frames).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot(labels, num_classes: int, on_value: float, off_value: float):
    return jax.nn.one_hot(labels, num_classes) * (on_value - off_value) + off_value


def mixup_target(labels, num_classes: int, lam, smoothing: float = 0.0):
    """lam * y + (1-lam) * y.flip(0) with label smoothing (mixup.py:42-49)."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = one_hot(labels, num_classes, on, off)
    y2 = one_hot(jnp.flip(labels, 0), num_classes, on, off)
    lam = jnp.asarray(lam, jnp.float32)
    lam = lam.reshape(lam.shape + (1,) * (y1.ndim - lam.ndim))
    return y1 * lam + y2 * (1.0 - lam)


def _rand_bbox_minmax_mask(rng, h: int, w: int, minmax, count=()):
    """Boolean [*count, H, W] cutmix box from ratio bounds (mixup.py:66-96).

    rand_bbox_minmax: height/width drawn independently as uniform fractions
    of the image in [minmax[0], minmax[1]); top-left uniform so the box fits
    entirely; lam is always the corrected 1 - area ratio.
    """
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    cut_h = jax.random.randint(
        k1, count, int(h * minmax[0]), int(h * minmax[1]))
    cut_w = jax.random.randint(
        k2, count, int(w * minmax[0]), int(w * minmax[1]))
    y1 = jax.random.randint(k3, count, 0, jnp.maximum(h - cut_h, 1))
    x1 = jax.random.randint(k4, count, 0, jnp.maximum(w - cut_w, 1))
    y2 = y1 + cut_h
    x2 = x1 + cut_w
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    rmask = (rows >= y1[..., None]) & (rows < y2[..., None])
    cmask = (cols >= x1[..., None]) & (cols < x2[..., None])
    mask = rmask[..., :, None] & cmask[..., None, :]
    lam = 1.0 - (cut_h * cut_w).astype(jnp.float32) / float(h * w)
    return mask, lam


def _rand_bbox_mask(rng, h: int, w: int, lam, count=()):
    """Boolean [*count, H, W] cutmix box mask with area ratio ~= 1-lam.

    Follows rand_bbox (mixup.py:50-63): box half-extents from sqrt(1-lam),
    center uniform, clipped at borders; returns (mask, corrected_lam).
    """
    ratio = jnp.sqrt(1.0 - lam)  # [*count]
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    k1, k2 = jax.random.split(rng)
    cy = jax.random.randint(k1, count, 0, h)
    cx = jax.random.randint(k2, count, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    rmask = (rows >= y1[..., None]) & (rows < y2[..., None])  # [*count, H]
    cmask = (cols >= x1[..., None]) & (cols < x2[..., None])  # [*count, W]
    mask = rmask[..., :, None] & cmask[..., None, :]  # [*count, H, W]
    box_area = ((y2 - y1) * (x2 - x1)).astype(jnp.float32)
    lam_corrected = 1.0 - box_area / float(h * w)  # correct_lam=True default
    return mask, lam_corrected


class Mixup:
    """Batch/elem mixup+cutmix with soft targets (mixup.py:110-240 surface)."""

    def __init__(self, mixup_alpha=1.0, cutmix_alpha=0.0, cutmix_minmax=None,
                 prob=1.0, switch_prob=0.5, mode="batch", correct_lam=True,
                 label_smoothing=0.1, num_classes=1000):
        self.cutmix_minmax = cutmix_minmax
        if cutmix_minmax is not None:
            # ratio-bounded boxes force cutmix on and corrected lam
            # (reference mixup.py:131-134)
            assert len(cutmix_minmax) == 2
            cutmix_alpha = 1.0
            correct_lam = True
        if mixup_alpha <= 0.0 and cutmix_alpha <= 0.0:
            # degenerate beta(1e-8,1e-8) draws would be ~Bernoulli{0,1} —
            # half the batches silently replaced by their flipped partner
            raise ValueError(
                "One of mixup_alpha > 0., cutmix_alpha > 0., cutmix_minmax "
                "not None should be true (reference mixup.py:157-158)")
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.prob = prob
        self.switch_prob = switch_prob
        self.mode = mode
        self.correct_lam = correct_lam
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def _sample_lam(self, rng, shape=()):
        """(lam, use_cutmix) draws honoring prob/switch_prob (mixup.py:152-176)."""
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        use_mix = jax.random.uniform(k1, shape) < self.prob
        both = self.mixup_alpha > 0.0 and self.cutmix_alpha > 0.0
        if both:
            use_cutmix = jax.random.uniform(k2, shape) < self.switch_prob
        else:
            use_cutmix = jnp.full(shape, self.cutmix_alpha > 0.0)
        a_mix = max(self.mixup_alpha, 1e-8)
        a_cut = max(self.cutmix_alpha, 1e-8)
        lam_mix = jax.random.beta(k3, a_mix, a_mix, shape)
        lam_cut = jax.random.beta(k4, a_cut, a_cut, shape)
        lam = jnp.where(use_cutmix, lam_cut, lam_mix)
        lam = jnp.where(use_mix, lam, 1.0)
        return lam.astype(jnp.float32), use_cutmix, use_mix

    def _box(self, rng, h: int, w: int, lam, count=()):
        if self.cutmix_minmax is not None:
            return _rand_bbox_minmax_mask(rng, h, w, self.cutmix_minmax,
                                          count)
        return _rand_bbox_mask(rng, h, w, lam, count)

    def __call__(self, rng, x, labels) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, T, H, W, C]; labels: int [B] → (mixed_x, soft_targets)."""
        b, t, h, w, c = x.shape
        k_lam, k_box = jax.random.split(rng)
        if self.mode == "batch":
            lam, use_cutmix, use_mix = self._sample_lam(k_lam)
            box, lam_cut = self._box(k_box, h, w, lam)
            if self.correct_lam:
                lam_cut_final = jnp.where(use_cutmix, lam_cut, lam)
            else:
                lam_cut_final = lam
            x_flip = jnp.flip(x, 0)
            mixed_mix = x * lam + x_flip * (1.0 - lam)
            mixed_cut = jnp.where(box[None, None, :, :, None], x_flip, x)
            mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
            lam_final = jnp.where(use_cutmix, lam_cut_final, lam)
            # prob gate (mixup.py:152-155 early return): samples the gate
            # excluded stay untouched — lam=1 suppresses plain mixup
            # already, but the minmax cutmix box is drawn lam-independent
            # and must be masked explicitly
            mixed = jnp.where(use_mix, mixed, x)
            lam_final = jnp.where(use_mix, lam_final, 1.0)
        else:  # elem / pair
            if self.mode == "pair":
                # per-PAIR draws mirrored onto the flipped partner
                # (reference _mix_pair, mixup.py:178-200: sample i mixes
                # with j = B-1-i using one shared lam and one shared box;
                # lam vector is [lam_half, lam_half reversed]; an odd
                # batch leaves the middle sample unmixed — the reference's
                # range(B//2) loop never touches it)
                half = b // 2

                def _mirror(v, mid):
                    parts = [v]
                    if b % 2:
                        parts.append(jnp.full((1,) + v.shape[1:], mid,
                                              v.dtype))
                    parts.append(jnp.flip(v, 0))
                    return jnp.concatenate(parts)

                lam_h, cut_h, mix_h = self._sample_lam(k_lam, (half,))
                box_h, lamc_h = self._box(k_box, h, w, lam_h, (half,))
                lam = _mirror(lam_h, 1.0)
                use_cutmix = _mirror(cut_h, False)
                use_mix = _mirror(mix_h, False)
                box = _mirror(box_h, False)
                lam_cut = _mirror(lamc_h, 1.0)
            else:
                lam, use_cutmix, use_mix = self._sample_lam(k_lam, (b,))
                box, lam_cut = self._box(k_box, h, w, lam, (b,))
            lam_cut_final = jnp.where(use_cutmix, lam_cut, lam) \
                if self.correct_lam else lam
            x_flip = jnp.flip(x, 0)
            lam_b = lam.reshape(b, 1, 1, 1, 1)
            mixed_mix = x * lam_b + x_flip * (1.0 - lam_b)
            mixed_cut = jnp.where(box[:, None, :, :, None], x_flip, x)
            mixed = jnp.where(
                use_cutmix.reshape(b, 1, 1, 1, 1), mixed_cut, mixed_mix
            )
            lam_final = jnp.where(use_cutmix, lam_cut_final, lam)
            # prob gate (see batch-mode note)
            mixed = jnp.where(use_mix.reshape(b, 1, 1, 1, 1), mixed, x)
            lam_final = jnp.where(use_mix, lam_final, 1.0)
        targets = mixup_target(
            labels, self.num_classes, lam_final, self.label_smoothing
        )
        return mixed.astype(x.dtype), targets
