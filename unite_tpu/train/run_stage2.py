"""Stage 2: supervised fine-tuning on source-domain video.

Counterpart of /root/reference/run_stage2.py:455-852: builds train/val/test
datasets, the classification ViT (imported from the stage-1 checkpoint with
head surgery), mixup, freeze policies, per-step cosine schedules with
layer-wise LR decay, EMA; per-epoch train + validation with best-checkpoint
tracking; final multi-view test + merge.

Run: ``python -m unite_tpu.train.run_stage2 --config configs/stage2_config.yaml
--dataset ucf-hmdb``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unite_tpu.config import parse_with_config
from unite_tpu.data.build import build_dataset
from unite_tpu.data.loader import device_prefetch, echo_batches
from unite_tpu.engines.finetune import make_eval_step, make_finetune_train_step
from unite_tpu.ops.mixup import Mixup
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.parallel import mesh as pmesh
from unite_tpu.train import common
from unite_tpu.train.args import stage2_parser
from unite_tpu.train.train_state import TrainState
from unite_tpu.utils import checkpoint as ck
from unite_tpu.utils import torch_import as ti
from unite_tpu.utils.registry import create_model


def build_model(args):
    return create_model(
        args.model,
        num_classes=args.nb_classes,
        all_frames=args.num_frames,
        tubelet_size=args.tubelet_size,
        fc_drop_rate=args.fc_drop_rate,
        drop_rate=args.drop,
        attn_drop_rate=args.attn_drop_rate,
        drop_path_rate=args.drop_path,
        use_learnable_pos_emb=args.use_learnable_pos_emb,
        use_mean_pooling=args.use_mean_pooling,
        init_scale=args.init_scale,
        classifier_type=args.head_type,
        classifier_hidden_dim=args.head_hidden_dim,
        dtype=common.compute_dtype(args),
        remat=args.use_checkpoint,
        remat_num=getattr(args, "checkpoint_num", -1),
        # Pallas calls have no GSPMD partitioning rule; under --tp the
        # einsum attention partitions over heads instead (parallel/mesh.py)
        use_pallas=False if common.tp_ways(args) > 1 else None,
    )


def load_finetune_ckpt(args, model, params):
    """run_stage2.py:349-438 import chain. Accepts torch .pth (published
    weights) or this framework's .msgpack checkpoints (stage chaining)."""
    if not args.finetune:
        return params
    if args.finetune.endswith(ck.CKPT_EXT):
        payload = ck.load_checkpoint(args.finetune)
        loaded = payload["model"]
        # a stage-1 adaptation checkpoint nests the backbone under
        # 'encoder' and carries clip decoders — take the encoder
        # (run_stage2.py:388-391 encoder-prefix strip semantics)
        if "encoder" in loaded:
            loaded = loaded["encoder"]
        merged, _, _ = ti.merge_params(params, loaded, strict_shapes=False)
        return merged
    state = ti.load_torch_state(args.finetune, args.model_key)
    state = ti.surgery_head(state, args.nb_classes, args.delete_head,
                            label_map_path=getattr(args, "label_map_path",
                                                   "") or None)
    state = ti.strip_prefixes(state, ("backbone.", "encoder."))
    n_patch = (args.input_size // args.patch_size) ** 2 * (
        args.num_frames // args.tubelet_size
    )
    state = ti.interpolate_pos_embed(
        state, n_patch, num_extra_tokens=0 if args.use_mean_pooling else 1,
        new_frames=args.num_frames, tubelet_size=args.tubelet_size,
    )
    loaded = ti.state_to_flax_params(state)
    merged, _, _ = ti.merge_params(params, loaded, strict_shapes=False)
    return merged


def trainable_mask(args, params, lp_phase: bool = False):
    """Freeze policies (run_stage2.py:711-746): head-only / frozen block ids
    / patch embedding / LP-FT's first phase (blocks 0-8 + patch embed)."""
    frozen_blocks = set()
    if getattr(args, "frozen_layers", ""):
        frozen_blocks = {int(x) for x in str(args.frozen_layers).split(",")
                         if str(x).strip() != ""}
    if lp_phase:
        frozen_blocks = set(range(9))

    def decide(path, _):
        head = path[0] if path else ""
        if args.train_head_only:
            # head + final norms (reference matches 'head'/'norm.weight')
            return head in ("head", "fc_norm", "norm")
        if head.startswith("blocks_") and int(head.split("_")[1]) in frozen_blocks:
            return False
        if (args.freeze_patch_embedding or lp_phase) and head == "patch_embed":
            return False
        return True

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mask = {}
    for keypath, _ in flat:
        path = tuple(k.key for k in keypath)
        node = mask
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = decide(path, None)
    return mask


def main(args):
    start = time.time()
    mesh = common.setup_run(args)
    from unite_tpu.utils.logging import maybe_tensorboard, maybe_wandb
    tb = maybe_tensorboard(args)
    wb = maybe_wandb(args)
    reader = common.reader_for(args)

    args.data_path = args.ann_file_train
    ds_train, args.nb_classes = build_dataset(
        "train", args, anno_path=args.ann_file_train, reader=reader)
    eval_reader = common.reader_for(args, for_eval=True)
    ds_val, _ = build_dataset("validation", args,
                              anno_path=args.ann_file_val, reader=eval_reader)
    ds_test, _ = build_dataset("test", args, anno_path=args.ann_file_test,
                               reader=eval_reader)
    loader = common.make_loader(
        ds_train, args, args.batch_size,
        repetitions=max(1, getattr(args, "train_repetitions", 1)))
    val_loader = common.make_loader(
        ds_val, args, args.batch_size_val, shuffle=False, drop_last=False)
    echo_k = max(1, getattr(args, "data_echo", 1) or 1)
    niter_per_ep = max(1, len(loader) * echo_k // args.update_freq)

    model = build_model(args)
    cdtype = common.compute_dtype(args)
    example = jnp.zeros(
        (1, args.num_frames, args.input_size, args.input_size, 3), cdtype)
    params = model.init(jax.random.PRNGKey(args.seed), example)["params"]
    params = load_finetune_ckpt(args, model, params)
    nparams = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {args.model}, params: {nparams / 1e6:.1f}M")

    # NO linear-scaling rule in stage 2: the reference consumes --lr
    # verbatim here (run_stage2.py:604), unlike stages 1/3
    lr_tab, wd_tab, peak_lr = common.lr_tables(args, niter_per_ep,
                                               args.num_sample,
                                               scale_rule=False)
    print(f"peak lr {peak_lr:.2e}, steps/epoch {niter_per_ep}")

    opt_groups = {}

    def build_tx(lp_phase: bool):
        tmask = trainable_mask(args, params, lp_phase=lp_phase)
        tx, groups = create_optimizer(
            args.opt, lr=lr_tab, params=params, weight_decay=wd_tab,
            betas=common.betas_for(args), eps=args.opt_eps,
            momentum=args.momentum,
            # the reference uses the model's own depth (run_stage2.py:615
            # model.get_num_layers()), not a name heuristic
            num_layers=model.depth,
            layer_decay=args.layer_decay if args.layer_decay < 1.0 else None,
            trainable_mask=tmask,
            mu_dtype=common.mu_dtype_for(args),
        )
        opt_groups.clear()
        opt_groups.update(groups)  # current phase's groups (meter scales)
        tx = common.wrap_update_freq(tx, args.update_freq, args.clip_grad)
        return tx

    # resolve the resume payload BEFORE building the optimizer so the LP/FT
    # phase (and hence the optimizer-state tree) matches the resumed epoch
    payload = None
    start_epoch, skip0 = args.start_epoch, 0
    # stage-2 auto-resume is gated on auto_reload in the reference
    # (run_stage2.py:702, default ON); inside auto_load_model, auto_resume
    # gates ONLY the numbered-checkpoint glob (utils.py:749) — latest/best
    # resume regardless of it.
    # --eval never auto-reloads: the reference's eval branch exits BEFORE
    # its auto_load (:685-702), evaluating exactly the --finetune weights
    if (getattr(args, "auto_reload", False) and not args.eval) or args.resume:
        payload = (ck.load_checkpoint(args.resume) if args.resume
                   else ck.auto_load_model(
                       args.output_dir,
                       include_numbered=getattr(args, "auto_resume", True)))
        if payload is not None:
            # mid-epoch (preempted) checkpoints replay the rest of the epoch;
            # skip0 counts BATCHES (micro-steps under update_freq)
            start_epoch, skip0 = common.resume_position(payload)
            common.check_echo_resume(payload, echo_k)

    tx = build_tx(lp_phase=start_epoch < args.lp_ft_epochs)
    state = TrainState.create(
        params, tx, ema_decay=args.model_ema_decay if args.model_ema else None)
    if payload is not None:
        # full resume: params + optimizer + step + EMA (utils.py:739-776);
        # sched_every_k maps the batch-counting state.step onto the
        # per-optimizer-step LR table in the tree-mismatch fallback
        state = ck.restore_train_state(state, payload,
                                       sched_every_k=args.update_freq)

    mixup_fn = None
    if args.mixup > 0 or args.cutmix > 0:
        mixup_fn = Mixup(
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
            mode=args.mixup_mode, label_smoothing=args.smoothing,
            num_classes=args.nb_classes,
        )

    layout = pmesh.state_layout(state, mesh, tp=common.tp_ways(args),
                                zero1=args.zero1,
                                fsdp=getattr(args, "fsdp", False))
    step_fn = pmesh.data_parallel_jit(
        make_finetune_train_step(
            model, mixup=mixup_fn, label_smoothing=args.smoothing,
            # under accumulation the clip lives inside MultiSteps (above);
            # the step still logs the per-micro-batch pre-clip grad norm
            clip_grad=args.clip_grad if args.update_freq == 1 else None,
            ema_decay=args.model_ema_decay if args.model_ema else None,
        ), mesh, state_shardings=layout,
    )
    eval_tfm = None
    if getattr(args, "device_eval_transforms", False):
        from unite_tpu.ops.eval_transforms import make_device_val_transform

        eval_tfm = make_device_val_transform(args.short_side_size,
                                             args.input_size)
    eval_fn = jax.jit(make_eval_step(model, input_transform=eval_tfm))
    if layout is not None:
        state = jax.device_put(state, layout)
    else:
        state = pmesh.replicate(state, mesh)

    if args.eval:
        # protocol parity: the reference's eval mode runs ONLY the
        # multi-view final_test + merge and exits (run_stage2.py:685-700);
        # its per-epoch validation (:784-785) never runs under --eval. It
        # does record the merged accuracies to log.txt + wandb (:694-699).
        stats = common.run_final_test(
            state, eval_fn, ds_test, args, mesh, args.batch_size_val,
            args.output_dir, cast_bf16=cdtype == jnp.bfloat16)
        print(stats)
        common.save_epoch_stats(args, args.epochs, stats)
        if wb is not None and stats:
            wb.log({"test/acc1": stats["test_acc1"],
                    "test/acc5": stats["test_acc5"]})
        common.finish(start, wb)
        return

    def batches(epoch):
        loader.set_epoch(epoch)
        if epoch == start_epoch and skip0:
            loader.skip_next_batches(skip0 // echo_k)
        for clips, labels, _, _ in loader:
            host = {"videos": common.as_video_array(clips),
                    "labels": np.asarray(labels, np.int32)}
            if cdtype == jnp.bfloat16:
                host = pmesh.cast_videos_bf16(host)
            yield pmesh.shard_batch(host, mesh)

    best_acc = common.resume_best_acc(payload)
    ckpt_io = ck.AsyncCheckpointer()  # epoch N+1 overlaps epoch N's write
    guard = common.PreemptionGuard(stop_after_steps=args.stop_after_steps)
    for epoch in range(start_epoch, args.epochs):
        if args.reset_train_dataset and epoch > 0:
            # remake_train_dataloader (run_stage2.py:440-453): fresh dataset
            # each epoch re-draws the train_fraction subset; the
            # epoch-salted seed keeps the run deterministic AND
            # resume-consistent (guarding on epoch > start_epoch would make
            # the first resumed epoch train on the base-seed subset instead
            # of the one the uninterrupted run used; epoch 0 keeps the
            # startup dataset in both cases)
            import copy

            a2 = copy.copy(args)
            a2.seed = args.seed + 100003 * epoch
            ds_train, _ = build_dataset(
                "train", a2, anno_path=args.ann_file_train, reader=reader)
            loader = common.make_loader(
                ds_train, args, args.batch_size,
                repetitions=max(1, getattr(args, "train_repetitions", 1)))
            print("Made new train dataloader.")
        if (args.lp_ft_epochs > 0 and epoch == args.lp_ft_epochs
                and not (epoch == start_epoch and skip0)):
            # (when resuming mid-epoch AT the switch epoch, the switch
            # already happened before preemption — build_tx(lp_phase=False)
            # at startup matched the checkpoint's FT optimizer tree, and
            # rebuilding here would discard the restored moments)
            # LP→FT switch: rebuild the optimizer with everything unfrozen
            # (fresh optimizer state for the newly-trainable params —
            # reference keeps torch state lazily; note a re-jit happens here)
            print(f"LP-FT: unfreezing all layers at epoch {epoch}")
            from unite_tpu.optim.factory import set_schedule_count

            new_tx = build_tx(lp_phase=False)
            new_state = TrainState.create(
                jax.device_get(state.params), new_tx,
                ema_decay=args.model_ema_decay if args.model_ema else None,
            )
            step_now = int(state.step)
            new_state = new_state.replace(
                step=jnp.asarray(step_now, jnp.int32),
                # state.step counts BATCHES; the LR/WD tables are indexed
                # per OPTIMIZER step (MultiSteps advances the inner count at
                # accumulation boundaries only)
                opt_state=set_schedule_count(
                    new_state.opt_state, step_now // args.update_freq),
            )
            if args.model_ema and state.ema_params is not None:
                # the LP phase's accumulated EMA carries over: the
                # reference's timm ModelEma persists untouched across its
                # requires_grad flip (run_stage2.py:741-747) — create()
                # would reset it to the instantaneous params
                new_state = new_state.replace(
                    ema_params=jax.device_get(state.ema_params))
            # match step_fn's pinned state in_shardings: a plain replicate
            # under --zero1/--fsdp/--tp would mismatch the declared layout
            # (the startup path uses device_put(state, layout) too)
            if layout is not None:
                state = jax.device_put(new_state, layout)
            else:
                state = pmesh.replicate(new_state, mesh)
        state, stats, _ = common.train_one_epoch(
            state, step_fn,
            device_prefetch(echo_batches(
                batches(epoch), echo_k,
                skip_echoes=(skip0 % echo_k
                             if epoch == start_epoch else 0)),
                lambda b: b, depth=2),
            epoch, args.log_freq,
            rng=jax.random.PRNGKey(args.seed + 1000),
            profile_dir=args.profile_dir or None, tb_logger=tb,
            wandb_logger=wb, preempt_guard=guard,
            sched=common.make_sched(
                lr_tab, wd_tab,
                epoch * niter_per_ep
                + (skip0 // args.update_freq if epoch == start_epoch else 0),
                opt_groups, every_k=args.update_freq,
                phase=(skip0 % args.update_freq
                       if epoch == start_epoch else 0)),
        )
        done = (skip0 if epoch == start_epoch else 0) + guard.steps_done
        # done counts batches; MultiSteps' mid-accumulation state is part
        # of opt_state and restores with it
        if common.preempted_mid_epoch(guard, ckpt_io, args, state, epoch,
                                      done, len(loader) * echo_k,
                                      args.save_ckpt,
                                      extra={"best_acc": best_acc}):
            return
        epoch_stats = {f"train_{k}": v for k, v in stats.items()}
        epoch_stats["n_parameters"] = nparams  # run_stage2.py:806-812
        if wb is not None:
            # per-epoch train accuracy marker (run_stage2.py:770-775;
            # class_acc is absent under mixup, logged as None there too)
            wb.log({"train/accuracy": stats.get("class_acc"),
                    "train/epoch": epoch})
        if (not args.disable_eval_during_finetuning
                and (epoch + 1) % args.eval_freq == 0):
            val_stats = common.run_validation(
                state, eval_fn, val_loader, mesh, args.batch_size_val,
                header=f"Val [{epoch}]", cast_bf16=cdtype == jnp.bfloat16)
            epoch_stats.update({f"val_{k}": v for k, v in val_stats.items()})
            if wb is not None and val_stats:
                # val/acc1, val/acc5, val/ece, val/loss (run_stage2.py:786-790)
                wb.log({f"val/{k}": v for k, v in val_stats.items()})
            if args.save_ckpt and val_stats.get("acc1", -1) > best_acc:
                best_acc = val_stats["acc1"]
                ckpt_io.save_train_state(args.output_dir, epoch, state,
                                         args=vars(args),
                                         extra={"best_acc": best_acc},
                                         tags=("best",))
        if args.save_ckpt:
            tags = ["latest"]
            if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
                tags.append(epoch)
            # best_acc rides in extra so a resumed run keeps tracking from
            # it instead of overwriting checkpoint-best with a worse model
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
        payload = None
        try:
            payload = ck.load_checkpoint(
                f"{args.output_dir}/checkpoint-best{ck.CKPT_EXT}")
        except FileNotFoundError:
            pass
        if payload is not None:
            state = state.replace(params=pmesh.replicate(payload["model"], mesh))
    test_stats = common.run_final_test(
        state, eval_fn, ds_test, args, mesh, args.batch_size_val,
        args.output_dir, cast_bf16=cdtype == jnp.bfloat16)
    common.save_epoch_stats(args, args.epochs, test_stats)
    if wb is not None and test_stats:
        # final merged accuracies (run_stage2.py:846-847)
        wb.log({"test/acc1": test_stats["test_acc1"],
                "test/acc5": test_stats["test_acc5"]})
    common.finish(start, wb)


if __name__ == "__main__":
    args = parse_with_config(stage2_parser(), sys.argv[1:])
    main(args)
