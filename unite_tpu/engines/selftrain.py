"""Stage-3 engine: collaborative self-training (student + CLIP zero-shot).

Counterpart of /root/reference/run_stage3.py:340-710, as one pure jitted
step. The reference's dynamic selected-subset loss re-expresses exactly as a
static masked mean: ``mean_over_selected(w·ce) * sel_ratio ==
sum(sel·w·ce)/B_t`` — identical math (including the sel_ratio scaling,
run_stage3.py:608-616), no dynamic shapes, and naturally 0 when nothing is
selected.

Components per step (all fused under jit):
* source CE with grads through encoder+classifier (:475-486);
* target full-video forward with encoder stop-grad, classifier grads
  (:480-483 no_grad encoder / live classifier);
* k=2 greedy committee masks from teacher attention (:493-506);
* selection-strategy dispatch incl. `clip_matchORconf` (:508-593) — note
  the reference overwrites ``most_conf_preds`` with the student predictions
  (:578-579, dead store), so pseudo-labels are ALWAYS the student's preds;
  replicated faithfully;
* confidence-weighted pseudo-label CE on committee member k-1 when
  ``train_masked`` (:599-616). Member k-1's logits are the only committee
  outputs with a non-zero gradient contribution (the other members feed
  argmax votes, which cut the gradient), so member k-1 runs as its own grad
  pass here while vote members run forward-only under stop_gradient — and
  vote members are skipped entirely for strategies that never consume
  sel_cons (including the shipped clip_matchORconf default): identical
  outputs, fewer FLOPs than the reference's batched k-member grad pass;
* diagnostics: sel_ratio, precision/recall vs ground truth, match/conf
  select+error rates (:593-597,676-703).

CLIP zero-shot similarities arrive in the batch (``clip_sim`` [B_t, C]) —
computed by ``clip_zero_shot_similarities`` below or any callable, keeping
the text encoder pluggable.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.engines.losses import cross_entropy
from unite_tpu.ops.masking import greedy_committee_masks, visible_indices
from unite_tpu.ops.normalize import normalize_videos
from unite_tpu.train.train_state import TrainState, clip_by_global_norm


def pool_outputs(x, use_cls_token: bool):
    """CLS token or token mean (run_stage3.py:333-338)."""
    if use_cls_token:
        return x[:, 0]
    return jnp.mean(x, axis=1)


def clip_zero_shot_similarities(image_features, text_features):
    """softmax(100 · img · text^T) averaged over frames (utils.py:55-68).

    image_features: [B, T, D] L2-normalized per-frame CLIP image features;
    text_features: [C, D] L2-normalized class-prompt features.
    """
    logits = 100.0 * jnp.einsum(
        "btd,cd->btc", image_features.astype(jnp.float32),
        text_features.astype(jnp.float32),
    )
    return jax.nn.softmax(logits, axis=-1).mean(axis=1)  # [B, C]


def make_selftrain_step(
    student,
    classifier,
    teacher,
    *,
    num_patches: int,
    frames: int,
    mask_ratio: float,
    committee_size: int = 2,
    selection_strategy: str = "clip_matchORconf",
    global_threshold: float = 0.5,
    clip_threshold: float = 0.1,
    conf_weighted_loss: bool = True,
    train_masked: bool = True,
    use_cls_token: bool = False,
    class_loss_src_ratio_pl: float = 1.0,
    class_loss_tgt_ratio: float = 1.0,
    full_oracle: bool = False,
    clip_grad: Optional[float] = None,
    clip_input_resolution: int = 224,
    nb_classes: int = 12,
    merge_full_passes: bool = False,
) -> Callable:
    """Build the stage-3 jitted step.

    ``state.params`` = {'model': student params, 'classifier': head params}.
    Batch dict: videos_s [B_s,...] (augmented source), labels_s,
    videos_t [B_t,...] (CLEAN target — full-video preds + CLIP zero-shot,
    run_stage3.py:480-483,552), videos_t_aug [B_t,...] (AUGMENTED target —
    teacher attention + committee forwards, :405-415,434-451,499-506; falls
    back to videos_t when absent), labels_t (diagnostics only), optional
    clip_sim [B_t, nb_classes], optional classwise_thresholds [nb_classes].
    """
    if merge_full_passes and getattr(student, "drop_path_rate", 0.0):
        # the merged [B_s+B_t] pass draws ONE stochastic-depth pattern
        # where the split passes draw two independent ones (rng_s/rng_t)
        # — at drop_path > 0 the "semantics-preserving" claim (and the
        # parity test) no longer holds; fail loudly instead of silently
        # changing pseudo-label selections
        raise ValueError(
            "merge_full_passes requires drop_path_rate == 0 (the merged "
            "forward shares one DropPath draw across source+target rows; "
            f"student has drop_path_rate={student.drop_path_rate})")
    patches_per_frame = num_patches // frames
    n_unmask_frame = patches_per_frame - int(patches_per_frame * mask_ratio)
    nv_committee = n_unmask_frame * frames
    k = committee_size
    # Which committee forwards does THIS strategy actually consume?
    # * member k-1's logits enter the pseudo-label CE iff train_masked
    #   (run_stage3.py:599-616) — the only committee pass that needs grads;
    # * members' argmax votes feed sel_cons, consumed only by the
    #   cons-family strategies (:509-550). For the rest (incl. the shipped
    #   clip_matchORconf default) those forwards affect no output at all
    #   (argmax cuts the gradient; logits_masked_t_correct is a dead store
    #   in the reference, :510-515), so they are skipped rather than
    #   replicated: same outputs, fewer FLOPs. "Same outputs" is exact for
    #   deterministic/zero-drop configs (the parity tests); with
    #   drop_path > 0 splitting the old single [k·B]-row committee forward
    #   into grad + vote forwards redraws the stochastic-depth pattern per
    #   part — a different but equally valid realization of the same
    #   distribution, not a behavioral difference.
    needs_votes = selection_strategy in (
        "cons", "consORconf", "consANDconf",
        "consORclasswise-conf", "consANDclasswise-conf",
    )
    n_vote = (k - 1 if train_masked else k) if needs_votes else 0
    needs_committee = train_masked or n_vote > 0
    if needs_committee and n_unmask_frame * k > patches_per_frame:
        # greedy masks give member i only every k-th attention-sorted patch
        # (ceil(N/k) max); asking for more visible tokens than that would
        # make the fixed-width visible_indices gather silently pad with
        # MASKED tokens — fail loudly instead (the reference would simply
        # produce smaller visible sets, a geometry this static-shape build
        # does not represent)
        raise ValueError(
            f"committee of k={k} disjoint masks cannot unmask "
            f"{n_unmask_frame}/{patches_per_frame} patches per frame each "
            f"(k*n_unmask > N); raise mask_ratio to at least "
            f"{1 - patches_per_frame // k / patches_per_frame:.3f} or "
            f"lower committee_size")

    from unite_tpu.engines.pretrain_umt import resize_for_teacher

    def train_step(
        state: TrainState, teacher_params, batch: Dict, rng
    ) -> Tuple[TrainState, Dict]:
        videos_s = normalize_videos(batch["videos_s"])
        labels_s = batch["labels_s"]
        videos_t = normalize_videos(batch["videos_t"])
        labels_t = batch["labels_t"]
        videos_t_aug = normalize_videos(
            batch.get("videos_t_aug", batch["videos_t"]))
        b_t = videos_t.shape[0]
        if "clip_sim" in batch and batch["clip_sim"].shape[-1] != nb_classes:
            # trace-time check (shapes are static): a zero-shot table built
            # for the wrong shift would silently mis-vote otherwise
            raise ValueError(
                f"clip_sim width {batch['clip_sim'].shape[-1]} != "
                f"nb_classes {nb_classes}")
        drop_rng = jax.random.fold_in(rng, state.step)

        vis_idx_grad = vis_idx_vote = None
        if needs_committee:
            if "attn" in batch:
                # injection hook (mirrors stage-1's vis_idx): externally
                # computed teacher attention for loss/selection parity checks
                # against the reference engine given identical inputs
                attn = batch["attn"]  # [B_t*T, HW]
            else:
                # teacher attention over AUGMENTED target clips
                # (run_stage3.py:434-451)
                clip_videos_t = resize_for_teacher(videos_t_aug,
                                                   clip_input_resolution)
                _, attn = teacher.apply({"params": teacher_params},
                                        clip_videos_t)
                attn = jax.lax.stop_gradient(attn)  # [B_t*T, HW]

            # committee visible-index sets (utils.py:89-120, :493-506):
            # member k-1 = the grad (CE) member, members 0..k-2 vote-only
            masks = greedy_committee_masks(attn, mask_ratio, k)  # [k,B_t*T,HW]
            if train_masked:
                vis_idx_grad = visible_indices(
                    masks[-1].reshape(b_t, -1), nv_committee)
            if n_vote:
                vis_idx_vote = visible_indices(
                    masks[:n_vote].reshape(n_vote * b_t, -1), nv_committee)

        def forward_parts(params):
            model_p, head_p = params["model"], params["classifier"]
            # one rng per forward: the reference's torch passes each draw
            # stochastic depth independently; a shared rng would give the
            # source/full-target/grad/vote forwards bitwise-identical
            # DropPath patterns and bias committee agreement
            rng_s, rng_t, rng_g, rng_v = jax.random.split(drop_rng, 4)

            def encode_pool(videos, vis_idx=None, *, frng):
                x_vis, _ = student.apply(
                    {"params": model_p}, videos, vis_idx, False, False,
                    rngs={"dropout": frng},
                )
                return pool_outputs(x_vis, use_cls_token)

            def head(feat):
                return classifier.apply({"params": head_p}, feat)

            if merge_full_passes:
                # single [B_s+B_t] full-vis encoder pass instead of two
                # B-sized ones: row-independent per-sample compute (LN,
                # per-row attention/matmuls — no cross-batch stats), so
                # slicing + row-wise stop_gradient reproduces the split
                # passes exactly at drop_path=0. The target rows' zero
                # cotangent still flows through the combined backward
                # (extra bwd FLOPs) — whether merged pass structure wins
                # at B=8 is an empirical TPU question (bench --stage3).
                b_s = videos_s.shape[0]
                feats = encode_pool(
                    jnp.concatenate([videos_s, videos_t], axis=0),
                    frng=rng_s)
                logits_full_s = head(feats[:b_s])
                # encoder stop-grad, classifier live (:480-483)
                feat_t = jax.lax.stop_gradient(feats[b_s:])
                logits_full_t = head(feat_t)
            else:
                logits_full_s = head(encode_pool(videos_s, frng=rng_s))
                # encoder stop-grad, classifier live (:480-483)
                feat_t = jax.lax.stop_gradient(
                    encode_pool(videos_t, frng=rng_t))
                logits_full_t = head(feat_t)
            # grad member (k-1): the pseudo-label CE input (:599-616)
            logits_grad_t = (head(encode_pool(videos_t_aug, vis_idx_grad,
                                              frng=rng_g))
                             if train_masked else None)
            # vote members: argmax only — forward under stop_gradient
            logits_vote_t = None
            if n_vote:
                videos_tv = (jnp.concatenate([videos_t_aug] * n_vote, axis=0)
                             if n_vote > 1 else videos_t_aug)
                logits_vote_t = jax.lax.stop_gradient(
                    head(encode_pool(videos_tv, vis_idx_vote, frng=rng_v))
                ).reshape(n_vote, b_t, -1)
            return logits_full_s, logits_full_t, logits_grad_t, logits_vote_t

        def loss_fn(params):
            (logits_full_s, logits_full_t,
             logits_grad_t, logits_vote_t) = forward_parts(params)
            loss_class_s = cross_entropy(logits_full_s, labels_s)

            probs_full_t = jax.nn.softmax(
                jax.lax.stop_gradient(logits_full_t).astype(jnp.float32), -1
            )
            msp_t = probs_full_t.max(-1)
            preds_full_t = probs_full_t.argmax(-1)

            sel_cons = None
            if needs_votes:
                # committee agreement with the full-video prediction
                # (:505-519): all k members' preds, grad member included
                parts = []
                if logits_vote_t is not None:
                    parts.append(logits_vote_t.argmax(-1))
                if train_masked:
                    parts.append(jax.lax.stop_gradient(
                        logits_grad_t).argmax(-1)[None, :])
                preds_masked = jnp.concatenate(parts, axis=0)  # [k, B_t]
                votes = (preds_masked == preds_full_t[None, :]).sum(0)
                sel_cons = votes >= k
            sel_conf = msp_t >= global_threshold

            diag = {}
            if selection_strategy == "conf":
                sel = sel_conf
            elif selection_strategy == "cons":
                sel = sel_cons
            elif selection_strategy == "consORconf":
                sel = sel_cons | sel_conf
            elif selection_strategy == "consANDconf":
                sel = sel_cons & sel_conf
            elif selection_strategy in ("classwise-conf", "consORclasswise-conf",
                                        "consANDclasswise-conf"):
                th = batch["classwise_thresholds"]  # [nb_classes]
                sel_cw = msp_t >= th[preds_full_t]
                if selection_strategy == "classwise-conf":
                    sel = sel_cw  # sel_cons is not computed for this one
                elif selection_strategy == "consORclasswise-conf":
                    sel = sel_cw | sel_cons
                else:
                    sel = sel_cw & sel_cons
            elif selection_strategy == "clip_only":
                clip_sim = batch["clip_sim"]
                sel = clip_sim.max(-1) >= global_threshold
            elif selection_strategy == "clip_matchORconf":
                clip_sim = batch["clip_sim"]
                clip_msp = clip_sim.max(-1)
                clip_preds = clip_sim.argmax(-1)
                match_mask = clip_preds == preds_full_t
                student_conf = msp_t >= clip_threshold
                clip_conf = clip_msp >= clip_threshold
                conf_mask = jnp.logical_xor(student_conf, clip_conf) & ~match_mask
                sel = conf_mask | match_mask
                correct = preds_full_t == labels_t
                diag["match_select_rate"] = match_mask.mean()
                diag["conf_select_rate"] = conf_mask.mean()
                diag["match_error_rate"] = (match_mask & ~correct).mean()
                diag["conf_error_rate"] = (conf_mask & ~correct).mean()
            elif selection_strategy == "oracle":
                sel = preds_full_t == labels_t
            else:
                raise ValueError(f"Invalid selection strategy: {selection_strategy}")

            # pseudo-labels are the student's full-video preds (:603-605 —
            # the most_conf_preds mix is dead-stored in the reference)
            ce_target = preds_full_t
            ce_input = logits_grad_t if train_masked else logits_full_t
            conf_w = msp_t if conf_weighted_loss else jnp.ones_like(msp_t)
            ce_t = cross_entropy(ce_input, ce_target, reduction="none")
            sel_f = sel.astype(jnp.float32)
            # == class_loss_tgt_ratio * sel_ratio * mean_over_selected(w*ce)
            loss_class_t = class_loss_tgt_ratio * jnp.mean(sel_f * conf_w * ce_t)
            if full_oracle:
                loss_class_t = cross_entropy(ce_input, labels_t)

            loss = class_loss_src_ratio_pl * loss_class_s + loss_class_t

            correct = (preds_full_t == labels_t).astype(jnp.float32)
            nsel = sel_f.sum()
            diag.update({
                "loss_class": loss_class_s,
                "loss_class_t": loss_class_t,
                "sel_ratio": sel_f.mean(),
                "correct_precision": jnp.where(
                    nsel > 0, (correct * sel_f).sum() / jnp.maximum(nsel, 1), 0.0
                ),
                "correct_recall": (correct * sel_f).sum()
                / jnp.maximum(correct.sum(), 1),
                "_preds_t": preds_full_t,
            })
            return loss, diag

        (loss, diag), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads, grad_norm = clip_by_global_norm(grads, clip_grad)
        state = state.apply_gradients(grads)
        # per-sample arrays for the epoch-level compare_model_predictions
        # table (run_stage3.py:789-817); the host loop routes ndim>0 metrics
        # into an array sink instead of the scalar meters
        preds_t = diag.pop("_preds_t")
        metrics = {"loss": loss, "grad_norm": grad_norm, **diag,
                   "preds_t": preds_t, "labels_t": labels_t}
        if "clip_sim" in batch:
            metrics["clip_preds_t"] = batch["clip_sim"].argmax(-1)
        return state, metrics

    return train_step


def compare_model_predictions(student_logits, clip_similarities, target):
    """Student-vs-CLIP agreement diagnostics (run_stage3.py:789-817).

    Accepts logits/similarities [N, C] or already-argmaxed preds [N].
    Returns the stat dict instead of printing (the entry script logs it)."""
    student_preds = np.asarray(student_logits)
    if student_preds.ndim > 1:
        student_preds = student_preds.argmax(-1)
    clip_preds = np.asarray(clip_similarities)
    if clip_preds.ndim > 1:
        clip_preds = clip_preds.argmax(-1)
    target = np.asarray(target)
    s_ok = student_preds == target
    c_ok = clip_preds == target
    agree = student_preds == clip_preds
    return {
        "student_acc": float(s_ok.mean()),
        "clip_acc": float(c_ok.mean()),
        "student_or_clip_correct": float((s_ok | c_ok).mean()),
        "student_clip_agree": int(agree.sum()),
        "student_clip_agree_correct": int((agree & s_ok).sum()),
        "student_clip_agree_incorrect": int((agree & ~s_ok).sum()),
        "student_clip_disagree": int((~agree).sum()),
        "student_clip_disagree_correct": int((~agree & s_ok).sum()),
        "student_clip_disagree_incorrect": int((~agree & ~s_ok).sum()),
    }


def make_selftrain_eval_step(student, classifier, use_cls_token: bool = False,
                             with_feats: bool = False,
                             input_transform=None):
    """Validation forward (run_stage3.py:714-787): full-vis encoder + head.

    ``with_feats``: also return the pooled encoder features (fp32 [B, width])
    for the kNN representation probe — off by default so the per-epoch
    validation and multi-view test hot paths don't materialize an output
    nobody reads.

    ``input_transform``: replaces the plain uint8 normalize (the
    --device_eval_transforms fused resize+crop+normalize path)."""

    transform = input_transform or normalize_videos

    def eval_step(state: TrainState, batch: Dict) -> Dict:
        x_vis, _ = student.apply(
            {"params": state.params["model"]},
            transform(batch["videos"]), None, False, True,
        )
        pooled = pool_outputs(x_vis, use_cls_token)
        logits = classifier.apply(
            {"params": state.params["classifier"]}, pooled,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
        from unite_tpu.engines.losses import accuracy_topk

        acc1, acc5 = accuracy_topk(logits, batch["labels"])
        out = {"probs": probs, "labels": batch["labels"], "acc1": acc1,
               "acc5": acc5,
               "loss": cross_entropy(logits, batch["labels"])}
        if with_feats:
            out["feats"] = pooled.astype(jnp.float32)
        return out

    return eval_step
