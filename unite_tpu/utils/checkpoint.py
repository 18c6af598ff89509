"""Checkpoint save / auto-resume with the reference's artifact semantics.

Counterpart of /root/reference/src/utils.py:689-776 (`save_model`,
`save_latest_model`, `auto_load_model`): periodic ``checkpoint-{epoch}``
(the every-``save_ckpt_freq`` policy lives in the entry scripts, as in
run_stage1.py:880-889), rolling ``checkpoint-latest`` every epoch,
``checkpoint-best`` on val improvement; auto-resume prefers latest, then
best, then the highest-numbered periodic checkpoint.

Format: flax msgpack of a plain dict
``{model, optimizer, epoch, args, [model_ema], [extra]}`` — the same logical
contents as the reference's torch.save payload (minus the AMP GradScaler,
which bf16 training does not need). Process-0-only writes in multihost runs;
writes are atomic (tmp + rename) so a crash never corrupts an existing file.
"""

from __future__ import annotations

import glob
import os
import re
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

CKPT_PREFIX = "checkpoint"
CKPT_EXT = ".msgpack"


def _path(output_dir: str, tag) -> str:
    return os.path.join(output_dir, f"{CKPT_PREFIX}-{tag}{CKPT_EXT}")


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def is_main_process() -> bool:
    # single source of truth lives with the mesh helpers
    from unite_tpu.parallel.mesh import is_main_process as _imp

    return _imp()


def _payload(epoch, model_params, opt_state, model_ema, args, extra):
    payload = {
        "model": _to_numpy_tree(model_params),
        "optimizer": _to_numpy_tree(opt_state) if opt_state is not None else None,
        "epoch": int(epoch),
        "args": dict(args) if args else {},
    }
    if model_ema is not None:
        payload["model_ema"] = _to_numpy_tree(model_ema)
    if extra:
        payload["extra"] = _to_numpy_tree(extra)
    return payload


def _atomic_write(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        # fsync before the rename: without it a kernel crash/power loss
        # shortly after os.replace can leave the NEW name truncated (data
        # still in page cache when the rename journals), destroying the
        # previous good checkpoint the rename was meant to protect
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_checkpoint(
    output_dir: str,
    epoch: int,
    model_params,
    opt_state=None,
    model_ema=None,
    args: Optional[dict] = None,
    extra: Optional[Dict[str, Any]] = None,
    tags=("latest",),
) -> None:
    """Serialize once, write under each tag ('latest', 'best', or epoch int)."""
    if not is_main_process():
        return
    blob = serialization.msgpack_serialize(
        _payload(epoch, model_params, opt_state, model_ema, args, extra)
    )
    os.makedirs(output_dir, exist_ok=True)
    for tag in tags:
        _atomic_write(_path(output_dir, tag), blob)


def find_resume_checkpoint(output_dir: str,
                           include_numbered: bool = True) -> Optional[str]:
    """latest > best > highest-numbered (reference utils.py:739-776 order).

    ``include_numbered``: the reference gates ONLY the numbered-checkpoint
    glob on ``args.auto_resume`` (utils.py:749) — latest/best resume
    unconditionally. Stage-2 passes ``include_numbered=args.auto_resume``
    to reproduce that exact split."""
    for tag in ("latest", "best"):
        p = _path(output_dir, tag)
        if os.path.exists(p):
            return p
    if not include_numbered:
        return None
    best_epoch, best_path = -1, None
    for p in glob.glob(_path(output_dir, "*")):
        m = re.search(rf"{CKPT_PREFIX}-(\d+){re.escape(CKPT_EXT)}$", p)
        if m and int(m.group(1)) > best_epoch:
            best_epoch, best_path = int(m.group(1)), p
    return best_path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def auto_load_model(output_dir: str, include_numbered: bool = True):
    """Returns the restored payload dict or None if nothing to resume."""
    path = find_resume_checkpoint(output_dir, include_numbered)
    if path is None:
        return None
    print(f"Auto resume checkpoint: {path}")
    return load_checkpoint(path)


def save_train_state(output_dir: str, epoch: int, state, args=None,
                     extra: Optional[Dict[str, Any]] = None,
                     tags=("latest",)) -> None:
    """Full-state checkpoint of a TrainState: params + optimizer + global
    step + EMA — the reference saves {model, optimizer, epoch, scaler, args,
    model_ema} (src/utils.py:699-717); we have no scaler (bf16).

    The optax state (a tree of NamedTuples) is flattened through flax's
    state-dict mechanism so it msgpack-serializes; ``restore_train_state``
    rebuilds it into a freshly-initialized state of the same structure."""
    from flax import serialization as _ser

    state = _gather_sharded(state)  # collective; no-op when all-addressable
    save_checkpoint(
        output_dir, epoch, state.params,
        opt_state=_ser.to_state_dict(state.opt_state),
        model_ema=state.ema_params,
        args=args,
        extra={**(extra or {}), "step": int(state.step)},
        tags=tags,
    )


def _gather_sharded(tree):
    """Replace jax.Array leaves that are neither fully addressable nor fully
    replicated (multihost --zero1 moments, --tp params) with their full host
    value via a cross-process allgather.

    COLLECTIVE: every process must call this, in the same order — a
    process-0-only snapshot/fetch of such leaves is illegal in
    multi-controller JAX (computations and __array__ both require either
    full addressability or full replication). Single-host runs (all leaves
    addressable) and plain-DP multihost runs (state fully replicated) take
    the no-op fast path."""
    needs = [x for x in jax.tree.leaves(tree)
             if isinstance(x, jax.Array)
             and not x.is_fully_addressable and not x.is_fully_replicated]
    if not needs:
        return tree
    from jax.experimental import multihost_utils

    # tiled=True: for a non-fully-addressable global array this returns the
    # full global value with its shape preserved (tiled=False raises)
    return jax.tree.map(
        lambda x: multihost_utils.process_allgather(x, tiled=True)
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not x.is_fully_replicated) else x,
        tree)


def _device_snapshot(tree):
    """On-device copies of every addressable jax.Array leaf (async dispatch,
    ~HBM-copy cost). The snapshot is independent of the live training state,
    so the train loop may immediately run a buffer-DONATING step on the
    original while a background thread fetches the copy to host.

    Non-fully-addressable leaves (multihost: replicated state spans other
    hosts' devices) are fetched to host immediately instead — jnp.copy is a
    computation, which a single process may not run on a multi-process
    array; __array__ on a fully-REPLICATED one is a plain local D2H fetch
    (sharded-but-unreplicated leaves were already gathered by
    ``_gather_sharded``)."""
    import jax.numpy as jnp

    def snap(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable:
            return jnp.copy(x)
        return np.asarray(x)

    return jax.tree.map(snap, tree)


class AsyncCheckpointer:
    """Non-blocking full-state saves.

    ``save_train_state`` snapshots the state on-device (cheap), then runs
    the D2H fetch + msgpack serialize + atomic write in a background
    thread — the train loop overlaps the next epoch with the write instead
    of stalling on it (the reference blocks its loop inside torch.save,
    src/utils.py:689-737; at multi-GB state sizes on TPU pods the transfer
    is the dominant cost, and it needs no device time).

    One save in flight: a new save (or ``wait()``) joins the previous one
    first and RE-RAISES its failure — a checkpoint that silently failed to
    land would defeat auto-resume (same fail-fast stance as the NaN guard).
    Entries must call ``wait()`` before reading checkpoints back (resume /
    test_best). The writer thread is NON-daemon on purpose: if the entry
    dies on an exception (e.g. the NaN fail-fast) the interpreter still
    joins the in-flight write at exit, so the newest epoch's checkpoint
    lands exactly as the reference's synchronous torch.save would.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint save failed") from err

    def save_train_state(self, output_dir: str, epoch: int, state, args=None,
                         extra: Optional[Dict[str, Any]] = None,
                         tags=("latest",)) -> None:
        # collective — BEFORE the main-process early return (all call sites
        # invoke save symmetrically on every process)
        state = _gather_sharded(state)
        if not is_main_process():
            return
        self.wait()
        snap = _device_snapshot(state)

        def _work():
            try:
                save_train_state(output_dir, epoch, snap, args=args,
                                 extra=extra, tags=tags)
            except BaseException as e:  # surfaced by the next wait()
                self._err = e

        self._thread = threading.Thread(
            target=_work, name="unite-ckpt-writer", daemon=False)
        self._thread.start()


def _fill_missing_entries(target_sd, payload_sd):
    """Recursive union for the optimizer forward-migration path: every key
    of ``target_sd`` (the current state's serialized form) takes the
    payload's value when present, else keeps the target's (fresh-init)
    value. Raises KeyError if the payload carries a key the target lacks —
    that is a genuine structure mismatch, not a grown NamedTuple."""
    if isinstance(target_sd, dict):
        if not isinstance(payload_sd, dict):
            raise ValueError("node kind mismatch")
        extra = set(payload_sd) - set(target_sd)
        if extra:
            raise KeyError(f"payload has unknown entries {sorted(extra)}")
        return {k: (_fill_missing_entries(v, payload_sd[k])
                    if k in payload_sd else v)
                for k, v in target_sd.items()}
    return payload_sd


def restore_train_state(state, payload: Dict[str, Any],
                        sched_every_k: int = 1):
    """Restore a payload into a TrainState created with the SAME optimizer.

    Mirrors the reference's auto_load_model (src/utils.py:739-776): params,
    optimizer state, global step (so per-step LR/WD tables and the
    step-folded PRNG continue where they left off), and EMA when both sides
    have one. If the saved optimizer tree does not match the current one
    (e.g. resuming across an LP→FT optimizer rebuild), falls back to
    continuing only the schedule count.

    ``sched_every_k``: batches per optimizer step (grad accumulation).
    ``state.step`` counts BATCHES (TrainState.apply_gradients increments per
    call) while the LR/WD tables are indexed per OPTIMIZER step, so the
    fallback schedule count is ``step // sched_every_k`` — stage 2 passes
    its ``update_freq`` here."""
    import jax.numpy as jnp
    from flax import serialization as _ser

    state = state.replace(params=payload["model"])
    step = int(payload.get("extra", {}).get("step", 0) or 0)
    restored_opt = False
    if payload.get("optimizer") is not None:
        try:
            state = state.replace(opt_state=_ser.from_state_dict(
                state.opt_state, payload["optimizer"]))
            restored_opt = True
        except (KeyError, ValueError, TypeError) as e:
            # forward-migration attempt: an optimizer state whose
            # NamedTuples GREW a trailing field since the checkpoint was
            # written (e.g. AdamPState/SGDPState/NovoState gained wd_base)
            # serializes as an index-keyed dict missing the new entries —
            # fill only those from the freshly-initialized state (their
            # init values) and keep every saved leaf. A payload with keys
            # the current state lacks is a genuine mismatch (LP-FT
            # rebuild) and still takes the schedule-only fallback.
            try:
                merged = _fill_missing_entries(
                    _ser.to_state_dict(state.opt_state),
                    payload["optimizer"])
                state = state.replace(opt_state=_ser.from_state_dict(
                    state.opt_state, merged))
                restored_opt = True
                print("optimizer state restored with forward-migrated "
                      "missing fields (new state entries kept at init)")
            except (KeyError, ValueError, TypeError):
                print(f"WARNING: optimizer state not restored ({e}); "
                      "continuing schedule only")
    if not restored_opt and step:
        from unite_tpu.optim.factory import set_schedule_count

        state = state.replace(
            opt_state=set_schedule_count(
                state.opt_state, step // max(1, int(sched_every_k))))
    if payload.get("model_ema") is not None and state.ema_params is not None:
        state = state.replace(ema_params=payload["model_ema"])
    return state.replace(step=jnp.asarray(step, jnp.int32))
