"""Stage 3: collaborative self-training on source + target.

Counterpart of /root/reference/run_stage3.py:992-1414: source train stream +
target stream (validation-mode dataset emitting clean+augmented clips),
adaptation student + frozen CLIP teacher + source classifier head (loaded
from the stage-2 checkpoint), pseudo-label selection (clip_matchORconf
default) with confidence weighting and masked-committee consistency; per-
epoch validation of encoder+classifier; final multi-view test + merge; also
writes ``src_classifier-latest`` alongside the model checkpoints
(run_stage3.py:1371-1372 semantics — here the classifier lives inside the
same param tree and checkpoint).

Run: ``python -m unite_tpu.train.run_stage3 --config configs/stage3_config.yaml
--dataset hmdb-arid``.
"""

from __future__ import annotations

import os
import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.config import parse_with_config
from unite_tpu.data.build import build_dataset
from unite_tpu.data.loader import cycle, device_prefetch, echo_batches
from unite_tpu.data.sharding import repetitions_to_match
from unite_tpu.engines.selftrain import (
    make_selftrain_eval_step,
    make_selftrain_step,
)
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.parallel import mesh as pmesh
from unite_tpu.train import common
from unite_tpu.train.args import stage3_parser
from unite_tpu.train.run_stage1 import (
    build_student,
    build_teacher,
    load_clip_teacher_params,
    load_student,
)
from unite_tpu.train.train_state import TrainState
from unite_tpu.utils import checkpoint as ck
from unite_tpu.utils import torch_import as ti


def build_classifier(args):
    """Linear(embed_dim, nb_classes) source classifier (run_stage3.py:1191)."""
    assert args.src_classifier_type == "linear"
    return nn.Dense(args.nb_classes, param_dtype=jnp.float32,
                    dtype=jnp.float32)


def _head_from_msgpack(path):
    payload = ck.load_checkpoint(path)
    model = payload["model"]
    if "classifier" in model and "model" in model:  # stage-3 combined tree
        c = model["classifier"]
        return {"kernel": np.asarray(c["kernel"]),
                "bias": np.asarray(c["bias"])}
    head = model.get("head", None)
    if head is not None:
        return {"kernel": np.asarray(head["kernel"]),
                "bias": np.asarray(head["bias"])}
    return None


def _head_from_torch(path, model_key):
    state = ti.load_torch_state(path, model_key)
    if "head.weight" in state:  # stage-2 ViT checkpoint
        return {"kernel": state["head.weight"].numpy().T.astype(np.float32),
                "bias": state["head.bias"].numpy().astype(np.float32)}
    if "weight" in state:  # bare Linear (reference src_classifier_*.pth)
        return {"kernel": state["weight"].numpy().T.astype(np.float32),
                "bias": state["bias"].numpy().astype(np.float32)}
    return None


def load_classifier_head(args, head_params):
    """Load the source-classifier head (run_stage3.py:1196-1223).

    The reference ALWAYS takes the head from ``student_init`` — the stage-2
    checkpoint carries ``head.*`` (:1203-1211) — and in --eval additionally
    overrides it with the ``src_classifier*`` file next to student_init
    (:1213-1219). Priority here: the eval glob, then the explicit
    ``--src_classifier_init`` (our extension), then ``student_init``
    itself. Accepts torch .pth (stage-2 ViT or bare-Linear classifier
    files) and our msgpack checkpoints, including the stage-3 combined
    tree whose head lives under ``model.classifier``. A candidate whose
    head shape mismatches (e.g. a K710-headed init) is skipped with a
    message, like the reference's non-strict load_state_dict."""
    candidates = []
    if getattr(args, "eval", False) and args.student_init:
        import glob

        candidates += sorted(glob.glob(os.path.join(
            os.path.dirname(args.student_init), "src_classifier*")))[:1]
    if args.src_classifier_init:
        candidates.append(args.src_classifier_init)
    if args.student_init:
        candidates.append(args.student_init)
    for path in candidates:
        got = (_head_from_msgpack(path) if path.endswith(ck.CKPT_EXT)
               else _head_from_torch(path, args.model_key))
        if got is None:
            continue
        if got["kernel"].shape != head_params["kernel"].shape:
            print(f"Skipping classifier head from {path}: shape "
                  f"{got['kernel'].shape} != {head_params['kernel'].shape}")
            continue
        print(f"Loading source classifier head from {path}")
        return got
    return head_params


def main(args):
    start = time.time()
    mesh = common.setup_run(args)
    from unite_tpu.utils.logging import maybe_tensorboard, maybe_wandb
    tb = maybe_tensorboard(args)
    wb = maybe_wandb(args)
    reader = common.reader_for(args)

    args.return_aug_for_val = True
    ds_source, args.nb_classes = build_dataset(
        "train", args, anno_path=args.ann_file_train, reader=reader)
    # the target stream feeds the TRAIN step (full-view clip + aug), so it
    # keeps the host eval transform path even under --device_eval_transforms
    import argparse as _argparse

    tgt_args = _argparse.Namespace(**vars(args))
    tgt_args.device_eval_transforms = False
    ds_target, _ = build_dataset(
        "validation", tgt_args, anno_path=args.ann_file_train_target,
        reader=reader)
    eval_reader = common.reader_for(args, for_eval=True)
    ds_val, _ = build_dataset("validation", args, anno_path=args.ann_file_val,
                              reader=eval_reader)
    ds_val.return_aug_for_val = False
    ds_test, _ = build_dataset("test", args, anno_path=args.ann_file_test,
                               reader=eval_reader)

    # stream length-matching (run_stage3.py:1096-1146): the smaller target
    # is repeated by ceil(src/tgt); a larger-or-equal target repeats the
    # SOURCE instead — by --train_repetitions when > 0, else auto
    # ceil(tgt/src) (:1106-1109)
    src_reps = 1
    if len(ds_target) >= len(ds_source):
        src_reps = (getattr(args, "train_repetitions", 0)
                    or repetitions_to_match(len(ds_source), len(ds_target)))
    src_loader = common.make_loader(ds_source, args, args.batch_size,
                                    repetitions=src_reps)
    reps = repetitions_to_match(len(ds_target), len(ds_source))
    tgt_loader = common.make_loader(ds_target, args, args.batch_size,
                                    repetitions=reps, seed=args.seed + 7)
    val_loader = common.make_loader(ds_val, args, args.batch_size_val,
                                    shuffle=False, drop_last=False)
    echo_k = max(1, getattr(args, "data_echo", 1) or 1)
    niter_per_ep = len(src_loader) * echo_k

    student = build_student(args)
    teacher = build_teacher(args)
    classifier = build_classifier(args)
    n_patch = (args.input_size // args.patch_size) ** 2 * (
        args.num_frames // args.tubelet_size)
    cdtype = common.compute_dtype(args)
    example = jnp.zeros(
        (1, args.num_frames, args.input_size, args.input_size, 3), cdtype)
    sp = student.init(jax.random.PRNGKey(args.seed), example)["params"]
    sp = load_student(args, sp)
    # classifier input dim == encoder width (run_stage3.py:1191 uses
    # model.module.head.in_features); read it off the final norm params
    embed_dim = sp["encoder"]["norm"]["scale"].shape[0]
    hp = classifier.init(jax.random.PRNGKey(args.seed + 1),
                         jnp.zeros((1, embed_dim)))["params"]
    hp = load_classifier_head(args, hp)
    tp = load_clip_teacher_params(args, teacher, example)
    params = {"model": sp, "classifier": hp}
    nparams = sum(x.size for x in jax.tree.leaves(params))
    print(f"student+classifier params: {nparams / 1e6:.1f}M")

    lr_tab, wd_tab, peak_lr = common.lr_tables(args, niter_per_ep,
                                               args.num_sample)
    print(f"peak lr {peak_lr:.2e}, steps/epoch {niter_per_ep}")
    # The reference's stage-3 optimizer is built over the ENCODER only
    # (run_stage3.py:1264: create_optimizer(args, model_without_ddp, ...);
    # src_classifier's params are never registered with any optimizer), so
    # the stage-2-loaded head stays fixed through self-training even though
    # it receives gradients. Freeze it identically here.
    # NOTE: no high-block freeze here — stage-3's full-vis classification
    # passes run EVERY encoder block (unlike stage-1's clip_only training),
    # so the whole encoder trains; only --freeze_clip_decoders composes
    # (reference run_stage3.py:918 mirrors run_stage1.py:596-600)
    _freeze_dec = getattr(args, "freeze_clip_decoders", False)

    def _model_live(path_first: str) -> bool:
        return not (_freeze_dec and path_first.startswith("clip_decoder"))

    _flat = jax.tree_util.tree_flatten_with_path(sp)[0]
    _mm = {}
    for _kp, _ in _flat:
        _pp = tuple(k.key for k in _kp)
        node = _mm
        for p in _pp[:-1]:
            node = node.setdefault(p, {})
        node[_pp[-1]] = _model_live(_pp[0])
    tmask = {"model": _mm,
             "classifier": jax.tree.map(lambda _: False, hp)}
    tx, opt_groups = create_optimizer(
        args.opt, lr=lr_tab, params=params, weight_decay=wd_tab,
        betas=common.betas_for(args), eps=args.opt_eps,
        momentum=args.momentum,
        trainable_mask=tmask, mu_dtype=common.mu_dtype_for(args),
    )
    state = TrainState.create(params, tx)

    payload = None
    start_epoch, skip0 = args.start_epoch, 0
    # --eval never auto-resumes (the reference's eval exit :1280 precedes
    # its auto_resume :1310): it evaluates exactly the student_init weights
    if (args.auto_resume and not args.eval) or args.resume:
        payload = (ck.load_checkpoint(args.resume) if args.resume
                   else ck.auto_load_model(args.output_dir))
        if payload is not None:
            # full resume: params + optimizer + step (utils.py:739-776);
            # mid-epoch (preempted) checkpoints replay the rest of the epoch
            state = ck.restore_train_state(state, payload)
            start_epoch, skip0 = common.resume_position(payload)
            common.check_echo_resume(payload, echo_k)
    # fast-forward the cycled target stream past everything already consumed
    # (one target batch per step) so resume replays an uninterrupted run
    tgt_iter = cycle(tgt_loader,
                     (start_epoch * niter_per_ep + skip0) // echo_k)

    layout = pmesh.state_layout(state, mesh, tp=common.tp_ways(args),
                                zero1=args.zero1,
                                fsdp=getattr(args, "fsdp", False))
    step_fn = pmesh.data_parallel_jit(
        make_selftrain_step(
            student, classifier, teacher, num_patches=n_patch,
            frames=args.num_frames // args.tubelet_size,
            mask_ratio=args.mask_ratio,
            selection_strategy=args.selection_strategy,
            clip_threshold=args.clip_threshold,
            conf_weighted_loss=args.conf_weighted_loss,
            train_masked=args.train_masked,
            use_cls_token=args.use_cls_token,
            class_loss_src_ratio_pl=args.class_loss_src_ratio_pl
            if args.class_loss_src_ratio_pl > 0 else 1.0,
            class_loss_tgt_ratio=args.class_loss_tgt_ratio,
            full_oracle=args.full_oracle,
            clip_grad=args.clip_grad,
            clip_input_resolution=args.clip_input_resolution,
            nb_classes=args.nb_classes,
        ),
        mesh, state_argnums=(0,), batch_argnums=(2,),
        state_shardings=layout,
    )
    eval_tfm = None
    if getattr(args, "device_eval_transforms", False):
        from unite_tpu.ops.eval_transforms import make_device_val_transform

        eval_tfm = make_device_val_transform(args.short_side_size,
                                             args.input_size)
    eval_fn = jax.jit(make_selftrain_eval_step(
        student, classifier, args.use_cls_token, input_transform=eval_tfm))
    tp = pmesh.replicate(tp, mesh)
    if layout is not None:
        state = jax.device_put(state, layout)
    else:
        state = pmesh.replicate(state, mesh)

    if args.eval:
        # evaluation-only: final multi-view test + merge, then exit —
        # implements the intent of the reference's commented-out eval block
        # (run_stage3.py:1280-1293); the classifier came from student_init's
        # directory via load_classifier_head (:1212-1219)
        test_stats = common.run_final_test(
            state, eval_fn, ds_test, args, mesh, args.batch_size_val,
            args.output_dir, cast_bf16=cdtype == jnp.bfloat16)
        common.save_epoch_stats(args, args.epochs, test_stats)
        if wb is not None and test_stats:
            wb.log({"test/acc1": test_stats["test_acc1"],
                    "test/acc5": test_stats["test_acc5"]})
        common.finish(start, wb)
        return

    if args.pseudolabel_threshold > 0:
        # preconditions the reference enforces (run_stage3.py:1225-1229);
        # the knob is otherwise dead there and here
        assert args.ann_file_train_target, \
            "pseudolabel_threshold requires a target stream"
        assert args.unmasked_classification, \
            "pseudolabel_threshold requires --unmasked_classification"
        print(f"Performing pseudolabeling with threshold: "
              f"{args.pseudolabel_threshold}")

    # CLIP zero-shot teacher (utils.py:44-82 setup_clip/clip_infer): the
    # clip_* selection strategies are load-bearing on real text features —
    # uniform similarities would turn clip_matchORconf's match_mask into
    # "student predicted class 0" (a different, biased selection rule), so
    # missing artifacts hard-error unless --allow_uniform_clip (smoke tests).
    zero_shot_fn = None
    if args.selection_strategy in ("clip_only", "clip_matchORconf"):
        from unite_tpu.models.clip_text import build_zero_shot_fn

        zero_shot_fn = build_zero_shot_fn(args, teacher, tp)
        if zero_shot_fn is None and not args.allow_uniform_clip:
            raise RuntimeError(
                f"selection_strategy={args.selection_strategy!r} needs the "
                "CLIP zero-shot teacher: pass --clip_text_features (see "
                "tools/extract_clip.py --features-for) or --clip_text_init "
                "+ --clip_bpe_path, or override with --allow_uniform_clip "
                "for smoke tests (NOT a faithful approximation of the "
                "reference, run_stage3.py:556-593)."
            )

    # skip on resume (start_epoch/skip0 > 0): a preemption restart must not
    # replay the full pre-adaptation val pass — and the weights are no
    # longer pre-adaptation, so re-dumping save_preds_path/'initial' would
    # mislabel the analysis artifact
    if args.initial_validation and start_epoch == 0 and skip0 == 0:
        init_stats = common.run_validation(
            state, eval_fn, val_loader, mesh, args.batch_size_val,
            header="Initial val", cast_bf16=cdtype == jnp.bfloat16,
            save_preds_path=(os.path.join(args.save_preds_path, "initial")
                             if args.save_preds_path else None))
        if wb is not None and init_stats:
            # pre-adaptation accuracy of the source-only model
            # (run_stage3.py:1298-1299)
            wb.log({"pre-adaptation/acc1": init_stats["acc1"],
                    "pre-adaptation/acc5": init_stats["acc5"]})
        if args.knn_eval:
            # representation-quality probe: source-train features classify
            # target-val videos (utils/knn.py — the reference's intended
            # src.knn surface). Separate feats-returning step so the
            # regular eval path never materializes features.
            feats_fn = jax.jit(make_selftrain_eval_step(
                student, classifier, args.use_cls_token, with_feats=True,
                input_transform=eval_tfm))
            # gallery = --ann_file_train_knn when the mapping provides one
            # (the *_sourceonly entries, dataset_mappings.yaml:9-12 in the
            # reference — its run_stage1.py:173 parses the key but never
            # reads it; here it selects the probe's gallery split),
            # else the source train split
            if getattr(args, "ann_file_train_knn", None):
                ds_knn, _ = build_dataset(
                    "validation", args, anno_path=args.ann_file_train_knn,
                    reader=eval_reader)
                ds_knn.return_aug_for_val = False
            else:
                ds_knn = ds_source
            knn_src = common.make_loader(ds_knn, args,
                                         args.batch_size_val, shuffle=False,
                                         drop_last=False)
            common.run_knn_probe(
                state, feats_fn, knn_src, val_loader, mesh,
                args.batch_size_val, args.nb_classes, k=args.knn_k,
                max_videos=args.knn_max_videos, cast_bf16=cdtype == jnp.bfloat16)

    def batches(epoch):
        src_loader.set_epoch(epoch)
        if epoch == start_epoch and skip0:
            src_loader.skip_next_batches(skip0 // echo_k)
        for clips_s, labels_s, _, _ in src_loader:
            clean_t, aug_t, labels_t, _names = next(tgt_iter)
            batch = {
                "videos_s": common.as_video_array(clips_s),
                "labels_s": np.asarray(labels_s, np.int32),
                "videos_t": common.as_video_array(clean_t),
                "videos_t_aug": common.as_video_array(aug_t),
                "labels_t": np.asarray(labels_t, np.int32),
                # shipped reference uses zero thresholds (run_stage3.py:1303)
                "classwise_thresholds": np.zeros(args.nb_classes, np.float32),
            }
            if zero_shot_fn is None:
                batch["clip_sim"] = np.full(
                    (batch["videos_t"].shape[0], args.nb_classes),
                    1.0 / args.nb_classes, np.float32)
            if cdtype == jnp.bfloat16:
                batch = pmesh.cast_videos_bf16(batch)
            sharded = pmesh.shard_batch(batch, mesh)
            if zero_shot_fn is not None:
                # on the already-sharded device clips: the old host
                # round-trip (np.asarray(zero_shot_fn(host_videos))) shipped
                # videos_t H2D a second time unsharded AND blocked the
                # producer thread on a device read every batch — this stays
                # a fully async device-side dispatch instead
                sharded["clip_sim"] = zero_shot_fn(sharded["videos_t"])
            yield sharded

    def wrapped_step(state, batch, rng):
        return step_fn(state, tp, batch, rng)

    best_acc = common.resume_best_acc(payload)
    ckpt_io = ck.AsyncCheckpointer()  # epoch N+1 overlaps epoch N's write
    guard = common.PreemptionGuard(stop_after_steps=args.stop_after_steps)
    for epoch in range(start_epoch, args.epochs):
        arrays = {}
        state, stats, _ = common.train_one_epoch(
            state, wrapped_step,
            device_prefetch(echo_batches(
                batches(epoch), echo_k,
                skip_echoes=(skip0 % echo_k
                             if epoch == start_epoch else 0)),
                lambda b: b, depth=2),
            epoch, args.log_freq,
            rng=jax.random.PRNGKey(args.seed + 1000),
            profile_dir=args.profile_dir or None, tb_logger=tb,
            wandb_logger=wb,
            array_sink=arrays, preempt_guard=guard,
            sched=common.make_sched(
                lr_tab, wd_tab,
                epoch * niter_per_ep + (skip0 if epoch == start_epoch else 0),
                opt_groups),
        )
        # checkpoints_enabled gates ALL writes (run_stage3.py:1359; NOTE the
        # reference YAML ships false and its stage3.sh never re-enables it —
        # the shipped reference stage 3 saves nothing; our stage3.sh enables
        # it so test_best has a checkpoint to read)
        saving = args.output_dir and args.checkpoints_enabled
        done = (skip0 if epoch == start_epoch else 0) + guard.steps_done
        # mid-epoch preemption skips validation/diagnostics (epoch incomplete)
        if common.preempted_mid_epoch(guard, ckpt_io, args, state, epoch,
                                      done, niter_per_ep, saving,
                                      extra={"best_acc": best_acc}):
            return
        epoch_stats = {f"train_{k}": v for k, v in stats.items()}
        epoch_stats["n_parameters"] = nparams  # run_stage3.py:1374-1380
        if "clip_preds_t" in arrays:
            # student-vs-CLIP agreement table (run_stage3.py:789-817)
            from unite_tpu.engines.selftrain import compare_model_predictions

            preds_t = np.concatenate(arrays["preds_t"])
            clip_preds_t = np.concatenate(arrays["clip_preds_t"])
            labels_t = np.concatenate(arrays["labels_t"])
            if jax.process_count() > 1:
                # per-host target shards → global table (equal-length
                # shards guaranteed by the padded per-host sampler)
                from jax.experimental import multihost_utils

                preds_t = multihost_utils.process_allgather(
                    preds_t).reshape(-1)
                clip_preds_t = multihost_utils.process_allgather(
                    clip_preds_t).reshape(-1)
                labels_t = multihost_utils.process_allgather(
                    labels_t).reshape(-1)
            cmp = compare_model_predictions(preds_t, clip_preds_t, labels_t)
            print(f"compare_model_predictions [{epoch}]: " + " ".join(
                f"{k}={v}" for k, v in cmp.items()))
            epoch_stats.update({f"cmp_{k}": v for k, v in cmp.items()})
        val_stats = common.run_validation(
            state, eval_fn, val_loader, mesh, args.batch_size_val,
            header=f"Val [{epoch}]", cast_bf16=cdtype == jnp.bfloat16,
            save_preds_path=(os.path.join(args.save_preds_path, f"epoch{epoch}")
                             if args.save_preds_path else None))
        epoch_stats.update({f"val_{k}": v for k, v in val_stats.items()})
        if wb is not None:
            if val_stats:
                # run_stage3.py:1350-1351
                wb.log({"val/acc1": val_stats["acc1"],
                        "val/acc5": val_stats["acc5"]})
            wb.log({"epoch": epoch})  # epoch marker (run_stage3.py:1384)
        if val_stats.get("acc1", -1) > best_acc:
            best_acc = val_stats["acc1"]
            if saving:
                ckpt_io.save_train_state(args.output_dir, epoch, state,
                                         args=vars(args),
                                         extra={"best_acc": best_acc},
                                         tags=("best",))
        tags = ["latest"]
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
            tags.append(epoch)
        if saving:
            # best_acc rides in extra so a resumed run keeps tracking from it
            ckpt_io.save_train_state(args.output_dir, epoch, state,
                                     args=vars(args),
                                     extra={"best_acc": best_acc}, tags=tags)
        common.save_epoch_stats(args, epoch, epoch_stats)
        if guard.triggered:  # preempted exactly at an epoch boundary
            ckpt_io.wait()
            print(f"Preempted after epoch {epoch}; exiting")
            return
    guard.uninstall()  # don't leak the SIGTERM handler into later forks
    ckpt_io.wait()  # checkpoint-best must be on disk before test_best reads it

    if args.test_best:
        try:
            payload = ck.load_checkpoint(
                f"{args.output_dir}/checkpoint-best{ck.CKPT_EXT}")
            state = state.replace(params=pmesh.replicate(payload["model"], mesh))
        except FileNotFoundError:
            pass
    test_stats = common.run_final_test(
        state, eval_fn, ds_test, args, mesh, args.batch_size_val,
        args.output_dir, cast_bf16=cdtype == jnp.bfloat16)
    common.save_epoch_stats(args, args.epochs, test_stats)
    if wb is not None and test_stats:
        # final merged accuracies (run_stage3.py:1412-1413)
        wb.log({"test/acc1": test_stats["test_acc1"],
                "test/acc5": test_stats["test_acc5"]})
    common.finish(start, wb)


if __name__ == "__main__":
    parser = stage3_parser()
    parser.add_argument("--clip_init", default="",
                        help="extracted OpenAI CLIP visual .pth for the teacher")
    args = parse_with_config(parser, sys.argv[1:])
    main(args)
