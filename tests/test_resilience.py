"""Resilience + determinism tests (SURVEY §5 failure-detection semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.engines.finetune import make_finetune_train_step
from unite_tpu.models.vit import VisionTransformer
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.train.common import train_one_epoch
from unite_tpu.train.train_state import TrainState


def tiny_setup(lr=1e-3):
    m = VisionTransformer(
        img_size=16, patch_size=8, embed_dim=16, depth=1, num_heads=2,
        num_classes=3, all_frames=2, tubelet_size=1, qkv_bias=True,
    )
    batch = {
        "videos": jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 2, 16, 16, 3)),
            jnp.float32),
        "labels": jnp.asarray([0, 1, 2, 0]),
    }
    params = m.init(jax.random.PRNGKey(0), batch["videos"][:1])["params"]
    tx, _ = create_optimizer("adamw", lr=lr, params=params)
    return m, TrainState.create(params, tx), batch


def test_nan_loss_raises():
    """Non-finite loss must stop training (reference exits 1,
    run_stage1.py:447-449)."""
    m, state, batch = tiny_setup()
    bad = dict(batch)
    bad["videos"] = batch["videos"].at[0, 0, 0, 0, 0].set(jnp.nan)
    step = jax.jit(make_finetune_train_step(m))
    with pytest.raises(FloatingPointError):
        train_one_epoch(state, step, [bad], epoch=0, log_freq=100)


def test_epoch_determinism():
    """Same seeds + data → bitwise-identical losses (deterministic mode)."""
    losses = []
    for _ in range(2):
        m, state, batch = tiny_setup()
        step = jax.jit(make_finetune_train_step(m))
        _, stats, last = train_one_epoch(
            state, step, [batch, batch], epoch=0, log_freq=100,
            rng=jax.random.PRNGKey(7))
        losses.append((stats["loss"], last["loss"]))
    assert losses[0] == losses[1]


def test_resume_continues_schedule(tmp_path):
    """Save → load → optimizer schedule position restored via extra.step."""
    from unite_tpu.optim.factory import set_schedule_count
    from unite_tpu.utils import checkpoint as ck

    m, state, batch = tiny_setup()
    table = np.array([1e-3, 1e-4, 1e-5, 1e-6], np.float32)
    tx, _ = create_optimizer("sgd", lr=table, params=state.params, momentum=0.0)
    state = TrainState.create(state.params, tx)
    step = jax.jit(make_finetune_train_step(m))
    for _ in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(0))
    ck.save_checkpoint(str(tmp_path), 0, state.params,
                       extra={"step": int(state.step)}, tags=("latest",))

    payload = ck.auto_load_model(str(tmp_path))
    resumed = TrainState.create(payload["model"], tx)
    resumed = resumed.replace(
        step=jnp.asarray(payload["extra"]["step"], jnp.int32),
        opt_state=set_schedule_count(resumed.opt_state,
                                     payload["extra"]["step"]),
    )
    # resumed params identical
    for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # next update uses table[2], not table[0]
    updates, _ = resumed.tx.update(
        jax.tree.map(jnp.ones_like, resumed.params), resumed.opt_state,
        resumed.params)
    mag = float(jnp.abs(updates["head"]["kernel"]).max())
    assert mag == pytest.approx(1e-5, rel=1e-5)


def _find_sched_count(opt_state):
    """First ScheduledState-style count in an optax state tree (the node
    set_schedule_count rewrites)."""
    if hasattr(opt_state, "count") and hasattr(opt_state, "inner"):
        return int(opt_state.count)
    if isinstance(opt_state, tuple):
        for v in opt_state:
            c = _find_sched_count(v)
            if c is not None:
                return c
    return None


def test_restore_sched_every_k_maps_batches_to_opt_steps():
    """restore_train_state's schedule-count fallback must divide state.step
    (a BATCH counter) by update_freq — the LR table is indexed per
    OPTIMIZER step under MultiSteps grad accumulation."""
    import optax

    from unite_tpu.utils import checkpoint as ck

    m, state, batch = tiny_setup()
    table = np.linspace(1e-3, 1e-6, 32).astype(np.float32)
    tx, _ = create_optimizer("sgd", lr=table, params=state.params,
                             momentum=0.0)
    tx = optax.MultiSteps(tx, every_k_schedule=4)
    state = TrainState.create(state.params, tx)
    # payload with no optimizer tree (forces the fallback) after 8 BATCHES
    payload = {"model": jax.device_get(state.params), "optimizer": None,
               "epoch": 0, "extra": {"step": 8}}
    resumed = ck.restore_train_state(state, payload, sched_every_k=4)
    assert int(resumed.step) == 8
    assert _find_sched_count(resumed.opt_state) == 2  # 8 batches / k=4
    # without the divisor the count would jump to batch index 8
    wrong = ck.restore_train_state(state, payload)
    assert _find_sched_count(wrong.opt_state) == 8


def test_best_acc_persists_across_resume(tmp_path):
    """checkpoint extra carries best_acc so a resumed run cannot clobber
    checkpoint-best with a worse model (fixes the -1.0 restart; the
    reference shares the bug, run_stage2.py:751)."""
    from unite_tpu.train import common
    from unite_tpu.utils import checkpoint as ck

    _, state, _ = tiny_setup()
    ck.save_train_state(str(tmp_path), 3, state,
                        extra={"best_acc": 77.5}, tags=("latest",))
    payload = ck.auto_load_model(str(tmp_path))
    assert common.resume_best_acc(payload) == 77.5
    assert common.resume_best_acc(None) == -1.0
    # payloads from before the fix (no best_acc key) restart at -1.0
    assert common.resume_best_acc({"extra": {"step": 4}}) == -1.0


def test_last_step_not_double_counted():
    """When the epoch's last step is itself a log step, the post-loop final
    sync must not update the meters a second time."""
    from unite_tpu.utils.metrics import MetricLogger

    m, state, batch = tiny_setup()
    step = jax.jit(make_finetune_train_step(m))
    logger = MetricLogger()
    train_one_epoch(state, step, [batch], epoch=0, log_freq=10,
                    metric_logger=logger)
    assert logger.meters["loss"].count == 1
    # last step NOT on a log boundary → final sync still records it
    logger2 = MetricLogger()
    train_one_epoch(state, step, [batch, batch], epoch=0, log_freq=10,
                    metric_logger=logger2)
    assert logger2.meters["loss"].count == 2


def test_profiler_trace_closed_on_short_epoch(monkeypatch, tmp_path):
    """A trace started at step 2 must be stopped when the epoch ends before
    the step-7 stop point (otherwise it records the whole run)."""
    calls = {"start": 0, "stop": 0}
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda *a, **k: calls.__setitem__(
                            "start", calls["start"] + 1))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.__setitem__("stop", calls["stop"] + 1))
    m, state, batch = tiny_setup()
    step = jax.jit(make_finetune_train_step(m))
    train_one_epoch(state, step, [batch] * 4, epoch=0, log_freq=100,
                    profile_dir=str(tmp_path))
    assert calls == {"start": 1, "stop": 1}


def test_batch_clips_counts_all_video_streams():
    """clips/sec/chip must count every video tensor (stage 3 ships three
    streams; counting only videos_s understated it ~3x vs stage 1)."""
    from unite_tpu.train.common import _batch_clips

    v = np.zeros((2, 1, 4, 4, 3), np.float32)
    assert _batch_clips({"videos": np.zeros((5, 1, 4, 4, 3))}) == 5
    assert _batch_clips({"videos_s": v, "videos_t": v, "videos_t_aug": v,
                         "labels_s": np.zeros(2)}) == 6
