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
