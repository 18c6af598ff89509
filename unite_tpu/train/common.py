"""Shared runtime for the stage entry points.

The host-side frame around the jitted steps: run setup (seeds, experiment
dir, mesh), loader construction, the per-epoch train loop with MetricLogger,
padded validation (static batch shapes under jit — the final short batch is
padded and the padding sliced off host-side), multi-view test + merge, and
checkpoint-import orchestration (the reference's load_student_from_ckpt /
load_from_ckpt chains, run_stage1.py:518-602 / run_stage2.py:349-438).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.config import dump_config, log_stats, prepare_output_dir
from unite_tpu.data.loader import DataLoader
from unite_tpu.data.sharding import ShardedSampler
from unite_tpu.data.video_reader import SyntheticVideoReader, default_reader
from unite_tpu.engines.finetune import merge, write_preds_file
from unite_tpu.parallel import mesh as pmesh
from unite_tpu.utils.metrics import MetricLogger, compute_ece
from unite_tpu.utils.schedules import (cosine_scheduler, scaled_lr,
                                       step_scheduler)


def setup_run(args):
    """Seeds, experiment dir, resolved-config dump, mesh (run_stage1 main
    preamble :604-650). Multihost runs initialize the JAX distributed
    runtime from the standard env (JAX_COORDINATOR_ADDRESS etc.) — the
    torchrun/SLURM rendezvous of utils.py:510-551 becomes one line."""
    import os as _os

    # is_initialized(), NOT process_count(): the latter initializes the XLA
    # backend, after which jax.distributed.initialize() raises — the guard
    # must not itself touch the backend
    if (_os.environ.get("JAX_COORDINATOR_ADDRESS")
            and not jax.distributed.is_initialized()):
        jax.distributed.initialize()
    np.random.seed(args.seed + jax.process_index())
    import random

    random.seed(args.seed + jax.process_index())
    if pmesh.is_main_process():
        prepare_output_dir(args.output_dir, args.overwrite)
        dump_config(args, args.output_dir)
    tp = tp_ways(args)
    if tp > 1:
        # 2-D (data, model) mesh; 'model' is the minor axis so each TP group
        # is a contiguous device block (same host, collectives ride ICI)
        if jax.device_count() % tp or jax.local_device_count() % tp:
            raise ValueError(
                f"--tp {tp} must divide the local device count "
                f"({jax.local_device_count()}) on every host")
        mesh = pmesh.make_mesh(("data", "model"),
                               shape=(jax.device_count() // tp, tp))
    else:
        mesh = pmesh.make_mesh()
    print(f"devices: {jax.device_count()} ({jax.local_device_count()} local), "
          f"mesh: {mesh}")
    return mesh


def reader_for(args, for_eval: bool = False):
    """Decode backend for a dataset. ``for_eval`` + --device_eval_transforms
    opens the native decoder with decode-time short-side scaling (swscale
    does the resize for free) so the host eval pipeline is decode-only;
    train datasets always get the unscaled reader (augmentation operates on
    the native raster, reference kinetics_sparse.py:218-281)."""
    scaled = (for_eval
              and getattr(args, "device_eval_transforms", False))
    if getattr(args, "synthetic_data", False):
        # fixed 256x320 raster: already a static canvas for the device path
        return SyntheticVideoReader(256, 320)
    return default_reader(
        short_side=getattr(args, "short_side_size", 256) if scaled else None)


def compute_dtype(args):
    """--compute_dtype: model compute dtype (bf16 production default;
    fp32 for CPU main-vs-main parity harnesses). Entries also gate the
    H2D bf16 video cast on this — fp32 runs ship/consume fp32 exactly."""
    name = getattr(args, "compute_dtype", "bfloat16") or "bfloat16"
    return jnp.dtype(name)


def mu_dtype_for(args):
    """--mu_dtype: storage dtype for the adam-family first moment (None =
    fp32 reference parity; 'bfloat16' halves the m HBM traffic — measured
    +0.7% stage-2 step, tools/stage2_probe.py)."""
    name = getattr(args, "mu_dtype", None)
    if not name or name == "float32":
        return None

    return jnp.dtype(name)


def wrap_update_freq(tx, update_freq: int, clip_grad=None):
    """Gradient accumulation wrapper (run_stage2.py's --update_freq).

    The reference clips the ACCUMULATED gradient once per optimizer step
    (engine_for_finetuning.py:109-126: NativeScaler clips at the
    update_grad boundary after k micro-backwards summed into .grad), so
    under accumulation the clip must live INSIDE optax.MultiSteps where it
    sees the averaged gradient — clip-of-mean != mean-of-clipped whenever
    a micro-batch norm exceeds clip_grad. The engine step then runs with
    clip_grad=None (it still logs the per-micro-batch pre-clip norm)."""
    import optax

    if update_freq <= 1:
        return tx
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return optax.MultiSteps(tx, every_k_schedule=update_freq)


def betas_for(args):
    """--opt_betas → create_optimizer betas: None when unset (reference
    run_stage2.py:95 default — each optimizer's own default then applies,
    e.g. novograd's (0.95, 0.98)), else the explicit pair."""
    b = getattr(args, "opt_betas", None)
    return None if b is None else tuple(b)


def tp_ways(args) -> int:
    """Tensor-parallel ways requested by --tp (1 = pure data parallel)."""
    return int(getattr(args, "tp", 1) or 1)


def per_host_batch(batch_size: int, tp: int = 1) -> int:
    """Per-host loader batch for a PER-CHIP ``batch_size`` argument.

    The reference's batch_size is per-GPU and its LR linear-scaling rule
    multiplies by world size (run_stage1.py:796-800); ``lr_tables`` below
    keeps that rule with world = jax.device_count(). Each JAX process feeds
    ALL of its local chips, so its loader must yield
    batch_size x local_device_count rows per step for the global batch to
    be batch_size x device_count.

    Under tensor parallelism (``tp`` > 1) a data-parallel replica spans tp
    chips, so batch_size becomes per-REPLICA and the per-host batch divides
    by tp (setup_run enforces tp | local_device_count)."""
    return int(batch_size) * jax.local_device_count() // max(1, tp)


def make_loader(dataset, args, batch_size, shuffle=True, drop_last=True,
                repetitions=1, seed=None):
    sampler = ShardedSampler(
        len(dataset), jax.process_count(), jax.process_index(),
        shuffle=shuffle, seed=args.seed if seed is None else seed,
        drop_last=False, repetitions=repetitions,
    )
    return DataLoader(
        dataset,
        batch_size=per_host_batch(batch_size, tp_ways(args)),
        sampler=sampler,
        num_workers=args.num_workers, drop_last=drop_last,
        worker_mode=getattr(args, "worker_mode", "thread"),
    )


def lr_tables(args, niter_per_ep: int, num_sample: int = 1,
              scale_rule: bool = True):
    """Per-step LR/WD tables, with the linear scaling rule when
    ``scale_rule`` (run_stage1.py:796-800, run_stage3.py:1235-1237,
    utils.py:646-663). The reference applies lr*total_batch*num_sample/256
    in stages 1 and 3 ONLY — stage 2 consumes --lr verbatim
    (run_stage2.py:604 'args.lr = args.lr'), so run_stage2 passes
    scale_rule=False (caught by tools/main_parity.py)."""
    total_batch = args.batch_size * jax.device_count() \
        // max(1, jax.process_count()) * jax.process_count() \
        // tp_ways(args)
    if scale_rule:
        lr = scaled_lr(args.lr, total_batch, num_sample)
        min_lr = scaled_lr(args.min_lr, total_batch, num_sample)
        warmup_lr = scaled_lr(args.warmup_lr, total_batch, num_sample)
    else:
        lr, min_lr, warmup_lr = args.lr, args.min_lr, args.warmup_lr
    family = getattr(args, "lr_schedule", "cosine")
    if family == "cosine":
        lr_tab = cosine_scheduler(
            lr, min_lr, args.epochs, niter_per_ep,
            warmup_epochs=args.warmup_epochs, start_warmup_value=warmup_lr,
            warmup_steps=args.warmup_steps,
        )
    elif family in ("constant", "step"):
        # run_stage2.py:656-667: constant = step schedule with no
        # milestones; 'step' decays by step_fraction at lr_step_epochs.
        # The reference passes its SCALAR step_fraction where
        # step_scheduler indexes step_fraction[i] — a TypeError in its own
        # 'step' branch; a scalar is broadcast per milestone here.
        steps = getattr(args, "lr_step_epochs", None) if family == "step" \
            else None
        if family == "step" and steps is None:
            raise ValueError("lr_schedule=step requires --lr_step_epochs")
        lr_tab = step_scheduler(
            lr, getattr(args, "step_fraction", 0.1), args.epochs, niter_per_ep,
            warmup_epochs=args.warmup_epochs, start_warmup_value=warmup_lr,
            warmup_steps=args.warmup_steps, steps=steps,
        )
    else:
        raise NotImplementedError(f"lr_schedule {family}")
    wd_end = args.weight_decay_end
    if wd_end is None:
        wd_end = args.weight_decay
    wd_tab = cosine_scheduler(args.weight_decay, wd_end, args.epochs,
                              niter_per_ep)
    return lr_tab, wd_tab, lr


def make_sched(lr_tab, wd_tab, offset: int, groups: Optional[Dict] = None,
               every_k: int = 1, phase: int = 0):
    """Schedule-meter context for ``train_one_epoch(sched=...)``.

    ``offset``: global OPTIMIZER-step index of this epoch's first batch
    (epoch·niter_per_ep, plus skipped steps on a mid-epoch resume).
    ``every_k``: batches per optimizer step (grad accumulation), mapping
    train_one_epoch's batch counter onto the tables' step axis.
    ``phase``: batches already consumed into the CURRENT accumulation
    window on a mid-epoch resume (skip0 % every_k) — without it
    floor(skip0/k) + floor(step_i/k) lags floor((skip0+step_i)/k), i.e.
    the reference's it = start_steps + data_iter_step // update_freq
    (engine_for_finetuning.py:71-74).
    ``groups``: the create_optimizer group table; its lr_scales give the
    reference's max/min per-group LR (run_stage1.py:460-467 iterates
    optimizer.param_groups; frozen scale-0 groups are excluded there by
    requires_grad, so exclude them here too)."""
    scales = [g["lr_scale"] for g in (groups or {}).values()
              if g["lr_scale"] > 0] or [1.0]
    return {"lr_tab": np.asarray(lr_tab), "wd_tab": np.asarray(wd_tab),
            "offset": int(offset), "every_k": max(1, int(every_k)),
            "phase": int(phase),
            "max_scale": float(max(scales)), "min_scale": float(min(scales))}


def _sched_values(sched: Dict, step_i: int) -> Dict:
    g = sched["offset"] + (sched.get("phase", 0) + step_i) // sched["every_k"]
    base = float(sched["lr_tab"][min(g, len(sched["lr_tab"]) - 1)])
    return {"lr": base * sched["max_scale"],
            "min_lr": base * sched["min_scale"],
            "weight_decay": float(
                sched["wd_tab"][min(g, len(sched["wd_tab"]) - 1)])}


def check_echo_resume(payload, echo_k: int):
    """A mid-epoch checkpoint's ``epoch_step`` counts ECHOED steps; the
    resume arithmetic (host batches = step // k, residual = step % k, and
    the target-stream fast-forward) is only exact when the resuming run
    uses the SAME --data_echo the checkpoint was written under. Epoch-
    boundary resumes are echo-independent (step units only feed the
    schedule offset there). Fail loudly instead of silently replaying the
    wrong batches."""
    if payload is None:
        return
    extra = payload.get("extra", {}) or {}
    if int(extra.get("epoch_step", 0) or 0) <= 0:
        return
    saved = (payload.get("args") or {}).get("data_echo", 1) or 1
    if int(saved) != int(echo_k):
        raise ValueError(
            f"mid-epoch resume with --data_echo {echo_k}, but the "
            f"checkpoint was written under --data_echo {saved}: the "
            "epoch_step replay arithmetic would skip the wrong host "
            "batches. Resume with the original echo factor (or restart "
            "from the last epoch boundary).")


def resume_position(payload, default_start_epoch: int = 0):
    """(start_epoch, epoch_step) from a restored checkpoint payload.

    A mid-epoch checkpoint (written by the preemption path with
    ``extra.epoch_step`` > 0) replays the SAME epoch from the step it
    stopped at — the entry skips the consumed batches index-level, so the
    remainder of the epoch is bitwise what an uninterrupted run produces.
    An epoch-boundary checkpoint starts the next epoch (the reference's
    only granularity, utils.py:739-776)."""
    if payload is None:
        return default_start_epoch, 0
    epoch_step = int((payload.get("extra") or {}).get("epoch_step", 0) or 0)
    if epoch_step > 0:
        return int(payload["epoch"]), epoch_step
    return int(payload["epoch"]) + 1, 0


def resume_best_acc(payload) -> float:
    """Best val acc1 recorded in a resumed checkpoint's ``extra`` — restart
    tracking from it so the first post-resume validation cannot overwrite
    checkpoint-best with a worse model (the reference shares this bug: its
    best_acc also restarts at 0 on resume, run_stage2.py:751)."""
    if payload is None:
        return -1.0
    v = (payload.get("extra") or {}).get("best_acc")
    # explicit None check: a recorded best_acc of exactly 0.0 is falsy but
    # must survive the resume (`or` would coerce it to -1.0 and let a
    # 0.0-acc validation overwrite checkpoint-best)
    return -1.0 if v is None else float(v)


class PreemptionGuard:
    """Preemption-safe early stop for the epoch loop.

    Installs a SIGTERM handler (the signal GCE/TPU-pod maintenance sends
    before reclaiming a VM); when it fires, ``train_one_epoch`` finishes the
    step in flight, stops, and the entry writes a mid-epoch checkpoint
    carrying ``epoch_step`` (batches consumed this epoch) so the next run
    resumes EXACTLY where this one stopped — the per-epoch batch order is
    deterministic, so skipping the consumed batches replays the remainder
    bitwise. The reference has no preemption handling at all (SURVEY §5);
    it can only lose the partial epoch.

    ``stop_after_steps``: fault-injection knob (also the test hook) — behave
    as if SIGTERM arrived after N steps of this process run.

    Multihost: best-effort — real preemption delivers SIGTERM to every host
    within the same grace window, and the checkpoint is written by process 0
    after its last COMPLETED step; a host that stops later merely blocks in
    its next collective until the VMs are reclaimed.
    """

    def __init__(self, stop_after_steps: int = 0, install_signals: bool = True):
        import signal as _signal

        self.triggered = False
        self.steps_done = 0  # steps run by the last train_one_epoch call
        self._steps_seen = 0
        self._stop_after = int(stop_after_steps or 0)
        self._prev_handler = None
        if install_signals:
            try:
                self._prev_handler = _signal.signal(
                    _signal.SIGTERM, self._on_signal)
            except ValueError:  # not the main thread
                pass

    def uninstall(self):
        """Restore the pre-existing SIGTERM disposition. Entries call this
        when the run completes: a handler left behind would be inherited by
        any later fork (process-worker loaders) and swallow the
        terminate() those pools rely on for shutdown."""
        import signal as _signal

        if self._prev_handler is not None:
            try:
                _signal.signal(_signal.SIGTERM, self._prev_handler)
            except ValueError:
                pass
            self._prev_handler = None

    def _on_signal(self, signum, frame):
        print(f"PreemptionGuard: caught signal {signum}; "
              "will checkpoint after the current step and exit", flush=True)
        self.triggered = True

    def step(self) -> bool:
        """Advance the per-run step count; True means stop now."""
        self._steps_seen += 1
        if self._stop_after and self._steps_seen >= self._stop_after:
            if not self.triggered:
                print(f"PreemptionGuard: stop_after_steps={self._stop_after} "
                      "reached; simulating preemption", flush=True)
            self.triggered = True
        return self.triggered


def preempted_mid_epoch(guard, ckpt_io, args, state, epoch: int, done: int,
                        niter_per_ep: int, saving: bool,
                        extra: Optional[Dict] = None) -> bool:
    """Shared epoch-end preemption handling for the three entries.

    True = the run was preempted MID-epoch and must exit now; when
    ``saving``, a checkpoint carrying ``epoch_step=done`` was written (and
    waited on) so the next run replays the rest of the epoch bitwise. An
    epoch-boundary preemption returns False — the caller runs its normal
    end-of-epoch saves, then checks ``guard.triggered`` itself.

    ``extra``: additional payload entries to persist (e.g. ``best_acc`` so
    the resumed run's best-checkpoint tracking continues where it left
    off)."""
    if not (guard.triggered and done < niter_per_ep):
        return False
    if saving:
        ckpt_io.save_train_state(args.output_dir, epoch, state,
                                 args=vars(args),
                                 extra={**(extra or {}), "epoch_step": done},
                                 tags=("latest",))
        ckpt_io.wait()
        print(f"Preempted at epoch {epoch} step {done}; "
              "checkpoint written, exiting")
    else:
        print(f"Preempted at epoch {epoch} step {done}; "
              "checkpointing disabled, exiting")
    return True


def train_one_epoch(
    state,
    step_fn: Callable,
    batches: Iterable,
    epoch: int,
    log_freq: int = 10,
    header_extra: str = "",
    metric_logger: Optional[MetricLogger] = None,
    extra_step_args: tuple = (),
    rng=None,
    profile_dir: Optional[str] = None,
    tb_logger=None,
    wandb_logger=None,
    array_sink: Optional[Dict] = None,
    preempt_guard: Optional[PreemptionGuard] = None,
    sched: Optional[Dict] = None,
):
    """Host loop around the jitted step (engine train_one_epoch frame).

    Logs a first-class ``clips/sec/chip`` scalar per window (the BASELINE
    north-star metric, SURVEY §5 tracing plan); ``profile_dir`` captures a
    jax.profiler trace of steps 2-7 of the epoch.

    ``array_sink``: optional dict; non-scalar metrics returned by the step
    are appended here per batch as DEVICE arrays (converted to the host's
    local shards at epoch end) so collection neither blocks the async
    dispatch chain per step nor tries to np.asarray a multi-host-sharded
    value. Without a sink, array metrics are dropped.

    ``sched`` (see ``make_sched``): host-side schedule tables; adds the
    reference's lr/min_lr/weight_decay meters to each log window
    (run_stage1.py:460-476,489-496) without any device read — the values
    come from the same tables the optimizer was built from.
    """
    logger = metric_logger or MetricLogger()
    rng = rng if rng is not None else jax.random.PRNGKey(epoch)
    header = f"Epoch [{epoch}]{header_extra}:"
    last_metrics = None
    n_chips = max(1, jax.device_count())
    step_i = 0
    window_t0 = time.time()
    window_clips = 0
    trace_active = False
    for batch in logger.log_every(batches, log_freq, header):
        if profile_dir and step_i == 2 and epoch == 0:
            jax.profiler.start_trace(profile_dir)
            trace_active = True
        state, metrics = step_fn(state, *extra_step_args, batch, rng)
        if array_sink is not None:
            for k, v in metrics.items():
                if getattr(v, "ndim", 0) > 0:
                    # keep the device array: no per-step sync, and
                    # np.asarray would raise on multi-host-sharded values
                    array_sink.setdefault(k, []).append(v)
        window_clips += _batch_clips(batch)
        # Device-to-host scalar reads cost a full dispatch round-trip each
        # (~30ms on tunneled devices), so metrics only sync on log steps —
        # steps in between stay fully async. The NaN fail-fast (reference
        # run_stage1.py:447-449) therefore fires within log_freq steps.
        if step_i % log_freq == 0:
            host = _scalar_metrics(metrics)
            if not np.isfinite(host["loss"]):
                raise FloatingPointError(
                    f"Loss is {host['loss']}, stopping training"
                )
            dt = time.time() - window_t0
            if window_clips:
                host["clips_per_sec_chip"] = window_clips / max(dt, 1e-9) / n_chips
            window_t0 = time.time()
            window_clips = 0
            if sched is not None:
                host.update(_sched_values(sched, step_i))
            logger.update(**host)
            if tb_logger is not None:
                # GLOBAL batch index (reference utils.py:426-447 keeps a
                # persistent step): a per-epoch step_i would overwrite the
                # previous epoch's curve at the same x-values
                gstep = (sched["offset"] * sched["every_k"]
                         + sched.get("phase", 0) + step_i) if sched else step_i
                tb_logger.update(head="train", step=gstep, **host)
            if wandb_logger is not None:
                wandb_logger.log({f"train/{k}": v for k, v in host.items()})
            last_metrics = host
        if profile_dir and step_i == 7 and epoch == 0:
            jax.profiler.stop_trace()
            trace_active = False
            print(f"profiler trace written to {profile_dir}")
        step_i += 1
        if preempt_guard is not None and preempt_guard.step():
            break
    if trace_active:
        # the epoch ended (or was preempted) before the step-7 stop point —
        # finalize the trace instead of letting it record the whole run
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}")
    # final sync of the epoch's last step — skipped when that step was
    # already a log step (updating the meters again would count it twice)
    if step_i > 0 and (step_i - 1) % log_freq != 0:
        host = _scalar_metrics(metrics)
        if not np.isfinite(host["loss"]):
            raise FloatingPointError(
                f"Loss is {host['loss']}, stopping training")
        if sched is not None:
            host.update(_sched_values(sched, step_i - 1))
        logger.update(**host)
        last_metrics = host
    if preempt_guard is not None:
        preempt_guard.steps_done = step_i
    if array_sink:
        # one sync at epoch end: pull each collected device array's LOCAL
        # shards (np.asarray on a multi-host-sharded value raises)
        for k, chunks in array_sink.items():
            array_sink[k] = [_local_host_array(v) for v in chunks]
    logger.synchronize_between_processes()
    print("Averaged stats:", logger)
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    return state, stats, last_metrics


def _scalar_metrics(metrics) -> Dict[str, float]:
    return {k: float(v) for k, v in metrics.items()
            if getattr(v, "ndim", 0) == 0}


def _local_host_array(v) -> np.ndarray:
    """Device array → this host's rows (handles multi-host shardings).

    Deduplicates replica shards (same index on several local devices) and
    orders the unique ones by their global offset."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        parts = {}
        for s in v.addressable_shards:
            if s.index:
                # this reassembly only handles dim-0 (batch) sharding; a
                # layout split along a later axis (GSPMD is free to pick
                # one for an un-annotated jit output) would silently lose
                # those columns if keyed on the dim-0 offset alone
                for d, sl in enumerate(s.index[1:], start=1):
                    if (sl.start or 0) != 0 or (
                            sl.stop is not None and sl.stop != v.shape[d]):
                        raise ValueError(
                            f"eval output sharded along axis {d} "
                            f"({s.index}); annotate the eval step's "
                            f"out_shardings to batch-axis/replicated")
            start = (s.index[0].start or 0) if s.index else 0
            parts.setdefault(start, np.asarray(s.data))
        return np.concatenate([parts[k] for k in sorted(parts)])
    return np.asarray(v)


def as_video_array(x) -> np.ndarray:
    """Host batch dtype policy: uint8 stays uint8 (device-side normalize,
    1 byte/px over the H2D link), everything else ships fp32 (cast to bf16
    by cast_videos_bf16)."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x
    return x.astype(np.float32, copy=False)


def _batch_clips(batch) -> int:
    """Global clip count of a (possibly sharded) batch dict.

    Counts EVERY video tensor in the batch so the clips/sec/chip meter is
    consistent across stages: stage 1 ships one [src;tgt] concat ('videos'),
    stage 3 ships three streams (videos_s + videos_t + videos_t_aug) that
    each get encoder work — counting only videos_s would understate stage-3
    throughput ~3x relative to stage 1."""
    if not isinstance(batch, dict):
        return 0
    return sum(int(v.shape[0]) for k, v in batch.items()
               if k.startswith("videos"))


def _pad_batch(batch: Dict, size: int) -> Dict:
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        n = v.shape[0]
        if n < size:
            pad = np.concatenate([v, np.repeat(v[-1:], size - n, axis=0)])
            out[k] = pad
        else:
            out[k] = v
    return out


def _eval_batches(state, eval_step, loader, mesh, batch_size: int,
                  out_key: str, cast_bf16: bool = False):
    """Shared eval-loop body for run_validation/collect_features: pad each
    host batch to ``batch_size``, shard, run ``eval_step``, and yield
    ``(out[out_key] rows, labels, true_n)`` for this host's real rows.

    ``cast_bf16``: ship float videos as bf16 over the H2D link, same as
    every train path (the entries' models compute in bf16 and cast their
    inputs anyway, so this halves eval transfer bytes for free); default
    off so fp32-model tests keep exact numerics.

    _local_host_array, not np.asarray: with multi-host shard_batch the
    step's outputs are data-sharded across processes and not fully
    addressable; the local shard rows ARE this host's batch rows by
    construction (make_array_from_process_local_data)."""
    for batch in loader:
        clips, labels = batch[0], batch[1]
        true_n = np.asarray(clips).shape[0]
        host = _pad_batch({"videos": clips, "labels": labels}, batch_size)
        host = {"videos": as_video_array(host["videos"]),
                "labels": np.asarray(host["labels"], np.int32)}
        if cast_bf16:
            host = pmesh.cast_videos_bf16(host)
        dev = pmesh.shard_batch(host, mesh)
        out = eval_step(state, dev)
        yield (_local_host_array(out[out_key])[:true_n],
               np.asarray(labels)[:true_n], true_n)


def run_validation(state, eval_step, loader, mesh, batch_size: int,
                   header: str = "Val", save_preds_path: Optional[str] = None,
                   cast_bf16: bool = False):
    """Padded-batch validation; gathers probs/labels for top1/5 + ECE
    (engine_for_finetuning.py:175-237).

    ``save_preds_path``: dump the gathered per-video predictions for
    offline analysis — preds.npy / labels.npy (the reference's
    ``save_preds_path`` intent, run_stage3.py:778-784, which ships
    commented out) plus probs.npy."""
    batch_size = per_host_batch(batch_size, pmesh.model_axis_size(mesh))  # pad to the loader's batch
    all_probs, all_labels = [], []
    loss_sum = n_total = 0.0
    for probs, labels_np, true_n in _eval_batches(
            state, eval_step, loader, mesh, batch_size, "probs",
            cast_bf16=cast_bf16):
        all_probs.append(probs)
        all_labels.append(labels_np)
        # CE recomputed host-side from the SLICED probs: the in-step mean
        # includes the padded repeat rows and would bias the last batch
        # (same slicing top1/5/ECE already get; -log softmax == the step's
        # cross_entropy on logits)
        nll = -np.log(np.maximum(
            probs[np.arange(true_n), labels_np], 1e-30))
        loss_sum += float(nll.sum())
        n_total += true_n
    if n_total == 0:
        return {}
    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        probs = multihost_utils.process_allgather(probs).reshape(-1, probs.shape[-1])
        labels = multihost_utils.process_allgather(labels).reshape(-1)
        # loss must aggregate across hosts too (top1/5/ECE already do via
        # the gathered probs; loss_sum/n_total were per-host)
        sums = multihost_utils.process_allgather(
            np.array([loss_sum, n_total], np.float64)).reshape(-1, 2)
        loss_sum = float(sums[:, 0].sum())
        n_total = float(sums[:, 1].sum())
    pred = probs.argmax(-1)
    top1 = 100.0 * (pred == labels).mean()
    order = np.argsort(-probs, axis=-1)[:, :5]
    top5 = 100.0 * (order == labels[:, None]).any(-1).mean()
    ece = compute_ece(probs, labels)
    stats = {"acc1": float(top1), "acc5": float(top5), "ece": float(ece),
             "loss": loss_sum / n_total}
    print(f"{header}: acc1 {top1:.2f} acc5 {top5:.2f} ece {ece:.4f}")
    if save_preds_path and pmesh.is_main_process():
        os.makedirs(save_preds_path, exist_ok=True)
        np.save(os.path.join(save_preds_path, "preds.npy"), pred)
        np.save(os.path.join(save_preds_path, "labels.npy"), labels)
        np.save(os.path.join(save_preds_path, "probs.npy"), probs)
        print(f"Saved predictions to {save_preds_path}")
    return stats


def collect_features(state, eval_step, loader, mesh, batch_size: int,
                     max_videos: int = 512, cast_bf16: bool = False):
    """Pooled encoder features + labels over a loader (for the kNN
    representation probe, utils/knn.py; requires an eval step that returns
    a ``feats`` entry). Stops after ``max_videos`` videos."""
    batch_size = per_host_batch(batch_size, pmesh.model_axis_size(mesh))  # pad to the loader's batch
    feats, labels = [], []
    n = 0
    for f, lab_np, true_n in _eval_batches(
            state, eval_step, loader, mesh, batch_size, "feats",
            cast_bf16=cast_bf16):
        feats.append(f)
        labels.append(lab_np)
        n += true_n
        if n >= max_videos:
            break
    if not feats:
        return np.zeros((0, 1), np.float32), np.zeros((0,), np.int64)
    f, l = np.concatenate(feats), np.concatenate(labels)
    if jax.process_count() > 1:
        # every process holds a 1/N loader shard: gather so the kNN bank
        # and the reported probe accuracy are global and identical on all
        # hosts (same fix as run_validation's loss aggregation; equal
        # per-host lengths guaranteed by the padded sampler + max_videos)
        from jax.experimental import multihost_utils

        f = multihost_utils.process_allgather(f).reshape(-1, f.shape[-1])
        l = multihost_utils.process_allgather(l).reshape(-1)
    return f, l


def run_knn_probe(state, eval_step, train_loader, val_loader, mesh,
                  batch_size: int, num_classes: int, k: int = 20,
                  max_videos: int = 512, cast_bf16: bool = False):
    """Representation-quality probe: cosine-kNN classify val features
    against train features (utils/knn.py, the DINO/UMT protocol — the
    reference intended this via its missing ``src.knn`` module)."""
    from unite_tpu.utils.knn import knn_classifier

    tr_f, tr_l = collect_features(state, eval_step, train_loader, mesh,
                                  batch_size, max_videos,
                                  cast_bf16=cast_bf16)
    va_f, va_l = collect_features(state, eval_step, val_loader, mesh,
                                  batch_size, max_videos,
                                  cast_bf16=cast_bf16)
    if tr_f.shape[0] == 0 or va_f.shape[0] == 0:
        return {}
    top1, top5 = knn_classifier(tr_f, tr_l, va_f, va_l, k=k,
                                num_classes=num_classes)
    print(f"kNN probe (k={k}, {tr_f.shape[0]} train / {va_f.shape[0]} val): "
          f"top1 {top1:.2f} top5 {top5:.2f}")
    return {"knn_top1": top1, "knn_top5": top5}


def run_final_test(state, eval_step, dataset, args, mesh, batch_size: int,
                   output_dir: str, cast_bf16: bool = False):
    """Multi-view test: per-view probs → per-process file → merge
    (engine_for_finetuning.py:241-351)."""
    batch_size = per_host_batch(batch_size, pmesh.model_axis_size(mesh))
    loader = DataLoader(
        dataset, batch_size=batch_size,
        sampler=ShardedSampler(len(dataset), jax.process_count(),
                               jax.process_index(), shuffle=False),
        num_workers=args.num_workers, drop_last=False,
        worker_mode=getattr(args, "worker_mode", "thread"),
    )
    path = os.path.join(output_dir, f"{jax.process_index()}.txt")
    if os.path.exists(path):
        os.remove(path)
    for batch in loader:
        clips, labels, vids, chunk_nb, split_nb = batch
        true_n = np.asarray(clips).shape[0]
        host = _pad_batch({"videos": as_video_array(clips),
                           "labels": np.asarray(labels, np.int32)}, batch_size)
        if cast_bf16:
            host = pmesh.cast_videos_bf16(host)
        dev = pmesh.shard_batch(host, mesh)
        out = eval_step(state, dev)
        probs = _local_host_array(out["probs"])[:true_n]
        records = [
            (vids[i], probs[i], int(labels[i]), int(chunk_nb[i]),
             int(split_nb[i]))
            for i in range(true_n)
        ]
        write_preds_file(path, records)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("final_test")
    if pmesh.is_main_process():
        top1, top5 = merge(output_dir, jax.process_count())
        print(f"Final test: top1 {top1:.2f} top5 {top5:.2f}")
        return {"test_acc1": top1, "test_acc5": top5}
    return {}


def save_epoch_stats(args, epoch: int, stats: Dict):
    if pmesh.is_main_process():
        log_stats({"epoch": epoch, **stats}, args.output_dir)


def finish(start_time: float, wandb_logger=None):
    if wandb_logger is not None:
        # finalize the run (real wandb: flush + exit status; mirror mode:
        # close the jsonl handle) — crashes before this point lose only
        # buffered history, same as the reference's implicit atexit
        wandb_logger.finish()
    total = time.time() - start_time
    print(f"Training time {datetime.timedelta(seconds=int(total))}")
