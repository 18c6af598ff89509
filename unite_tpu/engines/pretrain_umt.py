"""Stage-1 engine: UMT masked pre-training against the frozen CLIP teacher.

Counterpart of /root/reference/run_stage1.py:294-505 (inline train loop) and
src/engines/engine_for_pretraining_umt.py:32-172, as one pure jitted step:

    teacher fwd (stop-grad) → attention-multinomial mask → masked CLIP-target
    gather → student fwd on visible tokens → alignment loss → update.

TPU-native notes:
* the whole step (teacher + student + update) is ONE jitted function — no
  separate no_grad context needed, ``stop_gradient`` marks the teacher;
* ``torch.multinomial(attn, N)`` without replacement ≡ Gumbel top-k
  (ops/masking.attention_multinomial_mask) — a single static top_k;
* the dual-stream source+target batch is concatenated by the host loader;
  `clip_loss_data` source/target restriction (run_stage1.py:417-427) uses a
  per-row ``src_mask`` shipped in the batch when present (layout-agnostic —
  required under multihost, where the assembled global batch interleaves
  each process's [src; tgt] block), else a static B_s slice;
* mask injection: pass ``vis_idx`` in the batch to bypass the sampler (for
  loss-curve verification against the reference given identical masks —
  BASELINE.md parity protocol).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unite_tpu.engines.losses import clip_alignment_loss
from unite_tpu.models.clip import project_clip_taps
from unite_tpu.ops.normalize import normalize_videos
from unite_tpu.ops.masking import (
    attention_multinomial_mask,
    frame_mask_to_video,
    n_visible,
    visible_indices,
)
from unite_tpu.train.train_state import TrainState, clip_by_global_norm


def resize_for_teacher(videos, clip_input_resolution: int):
    """Bicubic resize to the teacher's resolution (run_stage1.py:365-373).

    torch-parity kernel (a=-0.75, no antialias, border-clamped taps) —
    jax.image.resize('bicubic') antialiases with a=-0.5 and deviates by
    ~1.0 on N(0,1) frames at 224→196, which would shift the frozen
    teacher's attention masks and alignment targets off the reference."""
    from unite_tpu.ops.eval_transforms import bicubic_resize_square

    if videos.shape[-3] == videos.shape[-2] == clip_input_resolution:
        return videos
    return bicubic_resize_square(videos, clip_input_resolution)


def make_pretrain_train_step(
    student,
    teacher,
    *,
    num_patches: int,
    frames: int,
    mask_ratio: float,
    source_batch_size: int,
    mask_type: str = "attention",
    clip_loss_type: str = "l2",
    clip_loss_data: str = "target",
    clip_grad: Optional[float] = None,
    clip_input_resolution: int = 224,
) -> Callable:
    """Build the stage-1 jitted step.

    Batch dict: ``videos`` [B, T, H, W, C] (source then target rows),
    optional ``vis_idx`` [B, N_vis_total] (tube/random masks from the data
    pipeline, or injected masks for parity checks).
    """
    patches_per_frame = num_patches // frames
    nv_frame = n_visible(patches_per_frame, mask_ratio)
    nv_total = nv_frame * frames

    def train_step(
        state: TrainState, teacher_params, batch: Dict, rng
    ) -> Tuple[TrainState, Dict]:
        videos = normalize_videos(batch["videos"])
        b = videos.shape[0]
        step_rng = jax.random.fold_in(rng, state.step)
        mask_rng, drop_rng = jax.random.split(step_rng)

        clip_videos = resize_for_teacher(videos, clip_input_resolution)
        # raw taps: ln_post/proj/L2 are per-token, so they run AFTER the
        # visible-token gather below (~20% of tokens at mask_ratio 0.8) —
        # math-identical to projecting everything then gathering.
        z_raw, attn = teacher.apply(
            {"params": teacher_params}, clip_videos, raw_taps=True
        )
        z_raw = jax.lax.stop_gradient(z_raw)  # [K, B, T*HW, width]
        attn = jax.lax.stop_gradient(attn)  # [B*T, HW]
        if attn.shape[-1] != patches_per_frame:
            # e.g. clip_l14 at the default 224 input has a 256-patch grid
            # vs the 16-patch student's 196; the reference resolves this by
            # resizing the teacher input (run_stage1.py:363-369 — L/14
            # teachers run at clip_input_resolution 196)
            raise ValueError(
                f"teacher patch grid ({attn.shape[-1]}/frame) != student "
                f"grid ({patches_per_frame}/frame); set "
                f"clip_input_resolution so teacher_res/teacher_patch == "
                f"student_res/student_patch (196 for L/14 teachers)")
        if z_raw.shape[2] != num_patches:
            # temporal mismatch the spatial check above cannot see: e.g.
            # --tubelet_size 2 against the kernel_size=1 clip_b16 teacher
            # gives T teacher frames vs T/2 student frames — vis_idx would
            # then index past z_raw and take_along_axis SILENTLY fills
            # out-of-range gathers under jit (NaN loss, no error)
            raise ValueError(
                f"teacher token count ({z_raw.shape[2]}) != student patches "
                f"({num_patches}): teacher frames x grid must equal the "
                f"student's num_frames/tubelet_size x grid (tubelet_size>1 "
                f"needs a tubelet-matched teacher)")

        if "vis_idx" in batch:
            # injection hook: tube/random data-side masks, or externally
            # drawn masks for loss-curve parity checks against the
            # reference (BASELINE.md: identical losses given identical masks)
            vis_idx = batch["vis_idx"]
        elif mask_type == "attention":
            mask_bt = attention_multinomial_mask(mask_rng, attn, mask_ratio)
            mask = frame_mask_to_video(mask_bt, b)  # [B, T*HW]
            vis_idx = visible_indices(mask, nv_total)
        else:
            raise ValueError(
                f"mask_type {mask_type!r} requires vis_idx in the batch")

        # masked CLIP-target gather (run_stage1.py:389-397), then the
        # teacher's frozen projection on the visible subset only
        raw_vis = jnp.take_along_axis(
            z_raw, vis_idx[None, :, :, None], axis=2
        )  # [K, B, N_vis, width]
        targets_clip = project_clip_taps(
            teacher_params, raw_vis,
            clip_norm_type=teacher.clip_norm_type, dtype=teacher.dtype,
        )  # [K, B, N_vis, C_clip]

        def loss_fn(params):
            x_clip = student.apply(
                {"params": params}, videos, vis_idx, clip_only=True,
                deterministic=False, rngs={"dropout": drop_rng},
            )  # [K, B, N_vis, C]
            t = targets_clip
            o = x_clip
            if clip_loss_data == "mixed":
                return clip_alignment_loss(o, t, clip_loss_type)
            if clip_loss_data not in ("source", "target"):
                raise NotImplementedError(clip_loss_data)
            if "src_mask" in batch:
                # layout-agnostic row weighting: under multihost assembly
                # the global batch interleaves each process's [src; tgt]
                # block, so a static slice would mislabel rows; the entry
                # ships a per-row source flag that shards with the batch
                w = batch["src_mask"].astype(jnp.float32)
                if clip_loss_data == "target":
                    w = 1.0 - w
                return clip_alignment_loss(o, t, clip_loss_type,
                                           row_weights=w)
            # single-process layout is [source; target]: static slice
            # (run_stage1.py:417-427)
            if clip_loss_data == "source":
                t, o = t[:, :source_batch_size], o[:, :source_batch_size]
            else:
                t, o = t[:, source_batch_size:], o[:, source_batch_size:]
            return clip_alignment_loss(o, t, clip_loss_type)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads, grad_norm = clip_by_global_norm(grads, clip_grad)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "loss_clip": loss, "grad_norm": grad_norm}

    return train_step
