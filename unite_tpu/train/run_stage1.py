"""Stage 1: UMT masked pre-training on target-domain video.

Counterpart of /root/reference/run_stage1.py:604-908: source(+target)
pretrain datasets with repetition length-matching, adaptation student +
frozen CLIP teacher (imported weights), per-step cosine schedules, fused
jitted train step (teacher fwd → attention masking → masked student →
alignment loss → adamw), periodic checkpointing.

Run: ``python -m unite_tpu.train.run_stage1 --config configs/stage1_config.yaml
--dataset hmdb-arid``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.config import parse_with_config
from unite_tpu.data.build import build_pretraining_dataset
from unite_tpu.data.loader import cycle, device_prefetch, echo_batches
from unite_tpu.data.sharding import repetitions_to_match
from unite_tpu.engines.pretrain_umt import make_pretrain_train_step
from unite_tpu.ops.masking import n_visible_total
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.parallel import mesh as pmesh
from unite_tpu.train import common
from unite_tpu.train.args import stage1_parser
from unite_tpu.train.train_state import TrainState
from unite_tpu.utils import checkpoint as ck
from unite_tpu.utils import torch_import as ti
from unite_tpu.utils.registry import create_model


def unused_block_mask(params, max_ret: int,
                      freeze_clip_decoders: bool = False):
    """trainable_mask freezing encoder blocks above ``max_ret`` (and the
    clip decoders under --freeze_clip_decoders, run_stage1.py:596-600:
    the reference sets requires_grad=False on every clip_decoder.* param).

    Under clip_only training the high blocks never run; the reference
    leaves their .grad None and torch AdamW skips None-grad params (no
    step, no decay), so the checkpoint carries their loaded weights
    bitwise. An optax update would instead see ZERO grads and still apply
    decoupled weight decay — freezing reproduces the torch semantics
    exactly."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mask = {}
    for keypath, _ in flat:
        path = tuple(k.key for k in keypath)
        live = True
        if (len(path) >= 2 and path[0] == "encoder"
                and path[1].startswith("blocks_")):
            live = int(path[1].split("_")[1]) <= max_ret
        if freeze_clip_decoders and path and                 path[0].startswith("clip_decoder"):
            live = False
        node = mask
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = live
    return mask


def build_student(args):
    """run_stage1.py:273-292 get_model."""
    return create_model(
        args.model,
        num_frames=args.num_frames,
        tubelet_size=args.tubelet_size,
        drop_path_rate=args.drop_path,
        use_learnable_pos_emb=args.use_learnable_pos_emb,
        use_cls_token=args.use_cls_token,
        clip_decoder_embed_dim=args.clip_decoder_embed_dim,
        clip_output_dim=args.clip_output_dim,
        clip_norm_type=args.clip_norm_type,
        clip_return_layers=tuple(args.clip_return_layers),
        dtype=common.compute_dtype(args),
        remat=args.use_checkpoint,
        remat_num=getattr(args, "checkpoint_num", -1),
        # Pallas calls have no GSPMD partitioning rule; under --tp the
        # einsum attention partitions over heads instead (parallel/mesh.py)
        use_pallas=False if common.tp_ways(args) > 1 else None,
    )


def build_teacher(args):
    """run_stage1.py:782-789: frozen CLIP teacher with attention output."""
    if not args.clip_return_attn:
        # the stage-1 engine unconditionally consumes (taps, attn) — and
        # attention masking cannot exist without attn; fail here with the
        # cause instead of a tuple-unpack error at trace time
        raise ValueError(
            "--clip_return_attn false is incompatible with stage-1: the "
            "engine needs the teacher's CLS-row attention for the masking "
            "path (run_stage1.py:379-387)")
    return create_model(
        args.clip_teacher,
        input_resolution=args.clip_input_resolution,
        clip_norm_type=args.clip_norm_type,
        return_attn=args.clip_return_attn,
        return_index=tuple(args.clip_return_layers),
        dtype=common.compute_dtype(args),
        use_pallas=False if common.tp_ways(args) > 1 else None,
    )


def load_student(args, params):
    """run_stage1.py:518-602 import chain (wrap in encoder., strip backbone,
    optional decoder init, pos-embed interpolation). Accepts torch .pth
    (published UMT weights) or this framework's .msgpack checkpoints."""
    if not args.student_init:
        return params
    if args.student_init.endswith(ck.CKPT_EXT):
        payload = ck.load_checkpoint(args.student_init)
        loaded = payload["model"]
        if "model" in loaded:  # stage-3 combined tree
            loaded = loaded["model"]
        if "encoder" not in loaded:  # bare classification ViT → nest
            loaded = {"encoder": loaded}
        merged, _, _ = ti.merge_params(params, loaded, strict_shapes=False)
        return merged
    state = ti.load_torch_state(args.student_init, args.model_key)
    state = ti.wrap_encoder_prefix(state)
    state = ti.strip_prefixes(state, ("backbone.",))
    if args.clip_decoder_init:
        dec = ti.load_torch_state(args.clip_decoder_init, args.model_key)
        state.update({k: v for k, v in dec.items()
                      if k.startswith("clip_decoder.")})
    n_patch = (args.input_size // args.patch_size) ** 2 * (
        args.num_frames // args.tubelet_size)
    state = ti.interpolate_pos_embed(
        state, n_patch, num_extra_tokens=1 if args.use_cls_token else 0,
        new_frames=args.num_frames, tubelet_size=args.tubelet_size,
        key="encoder.pos_embed",
    )
    loaded = ti.state_to_flax_params(state)
    merged, _, _ = ti.merge_params(params, loaded, strict_shapes=False)
    return merged


def load_clip_teacher_params(args, teacher, example):
    """Init then overlay extracted OpenAI weights if provided via
    args.prefix-style path (stage1.sh passes the extracted vit_b16.pth).

    The init example is built at clip_input_resolution, NOT input_size:
    the train step resizes clips before teacher.apply (resize_for_teacher)
    but init does not — an input_size example would trip the teacher's
    raster check for the L/14-at-196 recipe before training starts."""
    res = getattr(args, "clip_input_resolution", None) or args.input_size
    example = jnp.zeros(example.shape[:-3] + (res, res, 3), example.dtype)
    params = teacher.init(jax.random.PRNGKey(0), example)["params"]
    clip_path = getattr(args, "clip_init", "") or ""
    if clip_path:
        state = ti.load_torch_state(clip_path, "model|module|state_dict")
        loaded = ti.clip_state_to_flax_params(
            state, input_resolution=args.clip_input_resolution,
            patch_size=16 if "b16" in args.clip_teacher else 14,
        )
        params, _, _ = ti.merge_params(params, loaded, strict_shapes=False)
    return params


def main(args):
    start = time.time()
    mesh = common.setup_run(args)
    from unite_tpu.utils.logging import maybe_tensorboard, maybe_wandb
    tb = maybe_tensorboard(args)
    wb = maybe_wandb(args)
    reader = common.reader_for(args)

    ds_source = build_pretraining_dataset(
        args, anno_path=args.ann_file_train, reader=reader)
    ds_target = None
    if args.ann_file_train_target:
        ds_target = build_pretraining_dataset(
            args, anno_path=args.ann_file_train_target, reader=reader)

    # length-match streams via repetitions (run_stage1.py:711-752): the
    # SMALLER stream is repeated — the target by ceil(src/tgt) when it is
    # smaller, otherwise the SOURCE by ceil(tgt/src) (the reference
    # re-creates its source sampler for this, :721-736, growing the epoch);
    # --train_repetitions seeds the source repetitions (:666)
    b_s = args.batch_size
    b_t = args.batch_size if ds_target is not None else 0
    src_reps = max(1, getattr(args, "train_repetitions", 1))
    if ds_target is not None and len(ds_target) >= len(ds_source):
        # >= : at equal lengths the reference takes its else-branch and
        # REBUILDS the source sampler with computed reps (=1), discarding
        # --train_repetitions (run_stage1.py:718-736)
        src_reps = repetitions_to_match(len(ds_source), len(ds_target))
    src_loader = common.make_loader(ds_source, args, b_s,
                                    repetitions=src_reps)
    tgt_loader = None
    if ds_target is not None:
        reps = repetitions_to_match(len(ds_target), len(ds_source))
        tgt_loader = common.make_loader(ds_target, args, b_t,
                                        repetitions=reps, seed=args.seed + 7)
    echo_k = max(1, getattr(args, "data_echo", 1) or 1)
    niter_per_ep = len(src_loader) * echo_k

    student = build_student(args)
    teacher = build_teacher(args)
    n_patch = (args.input_size // args.patch_size) ** 2 * (
        args.num_frames // args.tubelet_size)
    nv = n_visible_total(n_patch, args.num_frames // args.tubelet_size,
                         args.mask_ratio, args.mask_type)
    cdtype = common.compute_dtype(args)
    example = jnp.zeros(
        (1, args.num_frames, args.input_size, args.input_size, 3), cdtype)
    # init with clip_only=False: the clip_only forward stops creating
    # blocks above max(clip_return_layers), so initializing with True
    # would DROP those blocks from the param tree — their pretrained
    # weights would be discarded at import and missing from the stage-1
    # checkpoint (the reference's early exit skips execution only,
    # modeling_adaptation.py:165-166; its checkpoints keep every block)
    sp = student.init(jax.random.PRNGKey(args.seed), example,
                      jnp.zeros((1, nv), jnp.int32), False)["params"]
    sp = load_student(args, sp)
    tp = load_clip_teacher_params(args, teacher, example)
    nparams = sum(x.size for x in jax.tree.leaves(sp))
    print(f"student params: {nparams / 1e6:.1f}M, N_vis {nv}/{n_patch}")

    lr_tab, wd_tab, peak_lr = common.lr_tables(args, niter_per_ep,
                                               args.num_sample)
    print(f"peak lr {peak_lr:.2e}, steps/epoch {niter_per_ep}")
    tx, opt_groups = create_optimizer(
        args.opt, lr=lr_tab, params=sp, weight_decay=wd_tab,
        betas=common.betas_for(args), eps=args.opt_eps,
        momentum=args.momentum,
        # blocks above max(clip_return_layers) never run under clip_only
        # training: the reference leaves their .grad None so torch AdamW
        # skips them entirely (no update, no decay) — freeze them so the
        # checkpointed weights pass through bitwise
        trainable_mask=unused_block_mask(
            sp, max(int(i) for i in args.clip_return_layers),
            freeze_clip_decoders=getattr(args, "freeze_clip_decoders",
                                         False)),
        mu_dtype=common.mu_dtype_for(args),
    )
    state = TrainState.create(sp, tx)

    start_epoch, skip0 = args.start_epoch, 0
    if args.auto_resume or args.resume:
        payload = (ck.load_checkpoint(args.resume) if args.resume
                   else ck.auto_load_model(args.output_dir))
        if payload is not None:
            # full resume: params + optimizer + step (utils.py:739-776);
            # mid-epoch (preempted) checkpoints replay the rest of the epoch
            state = ck.restore_train_state(state, payload)
            start_epoch, skip0 = common.resume_position(payload)
            common.check_echo_resume(payload, echo_k)
    # fast-forward the cycled target stream past everything already consumed
    # (one target HOST batch per echo_k steps) so resume replays an
    # uninterrupted run
    tgt_iter = (cycle(tgt_loader,
                      (start_epoch * niter_per_ep + skip0) // echo_k)
                if tgt_loader is not None else None)

    layout = pmesh.state_layout(state, mesh, tp=common.tp_ways(args),
                                zero1=args.zero1,
                                fsdp=getattr(args, "fsdp", False))
    step_fn = pmesh.data_parallel_jit(
        make_pretrain_train_step(
            student, teacher, num_patches=n_patch, frames=args.num_frames
            // args.tubelet_size, mask_ratio=args.mask_ratio,
            source_batch_size=b_s, mask_type=args.mask_type,
            clip_loss_type=args.clip_loss_type,
            clip_loss_data=args.clip_loss_data if ds_target is not None
            else "mixed",
            clip_grad=args.clip_grad,
            clip_input_resolution=args.clip_input_resolution,
        ),
        mesh, state_argnums=(0,), batch_argnums=(2,), donate_state=True,
        state_shardings=layout,
    )
    # teacher params replicated, passed per call (arg 1) — never donated
    tp = pmesh.replicate(tp, mesh)
    if layout is not None:
        state = jax.device_put(state, layout)
    else:
        state = pmesh.replicate(state, mesh)

    def batches(epoch):
        src_loader.set_epoch(epoch)
        if epoch == start_epoch and skip0:
            src_loader.skip_next_batches(skip0 // echo_k)
        for item in src_loader:
            videos, mask, _ = item
            src_mask = None
            if tgt_iter is not None:
                videos_t, mask_t, _ = next(tgt_iter)
                src_mask = np.concatenate([
                    np.ones(len(videos), np.float32),
                    np.zeros(len(videos_t), np.float32)])
                videos = np.concatenate([videos, videos_t], 0)
                if args.mask_type not in ("attention",):
                    mask = np.concatenate([mask, mask_t], 0)
            batch = {"videos": common.as_video_array(videos)}
            if src_mask is not None:
                # per-row source flag (shards with the batch): keeps the
                # clip_loss_data restriction correct under multihost batch
                # assembly, where a static slice would mislabel rows
                batch["src_mask"] = src_mask
            if args.mask_type not in ("attention",):
                bool_mask = np.asarray(mask).astype(bool).reshape(
                    videos.shape[0], -1)
                # numpy equivalent of ops.masking.visible_indices (stable
                # argsort of the bool mask, first n_vis): the jnp version
                # here would cost two tunnel round trips PER BATCH on the
                # producer thread (H2D mask + blocking D2H read) for
                # microseconds of host work
                batch["vis_idx"] = np.argsort(
                    bool_mask.astype(np.int32), axis=-1,
                    kind="stable")[:, :nv].astype(np.int32)
            if cdtype == jnp.bfloat16:
                batch = pmesh.cast_videos_bf16(batch)
            yield pmesh.shard_batch(batch, mesh)

    def wrapped_step(state, batch, rng):
        return step_fn(state, tp, batch, rng)

    ckpt_io = ck.AsyncCheckpointer()  # epoch N+1 overlaps epoch N's write
    guard = common.PreemptionGuard(stop_after_steps=args.stop_after_steps)
    for epoch in range(start_epoch, args.epochs):
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
            wandb_logger=wb, preempt_guard=guard,
            sched=common.make_sched(
                lr_tab, wd_tab,
                epoch * niter_per_ep + (skip0 if epoch == start_epoch else 0),
                opt_groups),
        )
        # checkpoints_enabled gates ALL writes (run_stage1.py:880; the
        # reference YAML ships false and stage1.sh re-enables it)
        saving = args.output_dir and args.checkpoints_enabled
        done = (skip0 if epoch == start_epoch else 0) + guard.steps_done
        if common.preempted_mid_epoch(guard, ckpt_io, args, state, epoch,
                                      done, niter_per_ep, saving):
            return
        tags = ["latest"]
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
            tags.append(epoch)
        if saving:
            ckpt_io.save_train_state(args.output_dir, epoch, state,
                                     args=vars(args), tags=tags)
        common.save_epoch_stats(
            args, epoch, {**{f"train_{k}": v for k, v in stats.items()},
                          "n_parameters": nparams})  # run_stage1.py:894-898
        if wb is not None:
            wb.log({"epoch": epoch})  # epoch marker (run_stage1.py:901)
        if guard.triggered:  # preempted exactly at an epoch boundary
            ckpt_io.wait()
            print(f"Preempted after epoch {epoch}; exiting")
            return
    guard.uninstall()  # don't leak the SIGTERM handler into later forks
    ckpt_io.wait()
    common.finish(start, wb)


if __name__ == "__main__":
    parser = stage1_parser()
    parser.add_argument("--clip_init", default="",
                        help="extracted OpenAI CLIP visual .pth for the teacher")
    args = parse_with_config(parser, sys.argv[1:])
    main(args)
