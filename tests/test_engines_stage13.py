"""Stage-1 and stage-3 engine tests (tiny models, CPU 8-device mesh)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.engines.pretrain_umt import make_pretrain_train_step, resize_for_teacher
from unite_tpu.engines.selftrain import (
    clip_zero_shot_similarities,
    make_selftrain_eval_step,
    make_selftrain_step,
    pool_outputs,
)
from unite_tpu.models.adaptation import AdaptationVisionTransformer
from unite_tpu.models.clip import CLIPVisionTransformer
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.train.train_state import TrainState

T, S, P = 4, 32, 16
N_PATCH = T * (S // P) ** 2  # 16


def tiny_student(**kw):
    cfg = dict(
        img_size=S, patch_size=P, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, num_frames=T, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24, clip_return_layers=(1,),
    )
    cfg.update(kw)
    return AdaptationVisionTransformer(**cfg)


def tiny_teacher():
    return CLIPVisionTransformer(
        input_resolution=S, patch_size=P, width=32, layers=2, heads=2,
        output_dim=24, return_attn=True, return_index=(0, 1),
    )


def video(n, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((n, T, S, S, 3)), jnp.float32
    )


def test_stage1_step_runs_and_loss_decreases():
    student = tiny_student(clip_return_layers=(0, 1), clip_output_dim=24)
    teacher = tiny_teacher()
    b_s, b_t = 2, 2
    videos = video(b_s + b_t)
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    nv = N_PATCH - int((N_PATCH // T) * 0.5) * T
    sp = student.init(
        jax.random.PRNGKey(1), videos[:1], jnp.zeros((1, nv), jnp.int32), True
    )["params"]
    tx, _ = create_optimizer("adamw", lr=1e-2, params=sp, weight_decay=0.0)
    state = TrainState.create(sp, tx)
    step = jax.jit(make_pretrain_train_step(
        student, teacher, num_patches=N_PATCH, frames=T, mask_ratio=0.5,
        source_batch_size=b_s, clip_loss_data="target",
        clip_input_resolution=S,
    ))
    batch = {"videos": videos}
    rng = jax.random.PRNGKey(2)
    losses = []
    for _ in range(15):
        state, m = step(state, tp, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # L2 alignment loss of normalized vectors lives in [0, 4]
    assert 0.0 <= losses[0] <= 4.0


def test_stage1_clip_loss_data_slicing():
    """source vs target slicing must select different halves."""
    student = tiny_student()
    teacher = tiny_teacher()
    videos = video(4, seed=3)
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    nv = N_PATCH - int((N_PATCH // T) * 0.5) * T
    sp = student.init(
        jax.random.PRNGKey(1), videos[:1], jnp.zeros((1, nv), jnp.int32), True
    )["params"]
    tx, _ = create_optimizer("sgd", lr=0.0, params=sp, momentum=0.0)
    losses = {}
    for mode in ("source", "target", "mixed"):
        step = jax.jit(make_pretrain_train_step(
            student, teacher, num_patches=N_PATCH, frames=T, mask_ratio=0.5,
            source_batch_size=2, clip_loss_data=mode, clip_input_resolution=S,
        ))
        state = TrainState.create(sp, tx)
        _, m = step(state, tp, {"videos": videos}, jax.random.PRNGKey(5))
        losses[mode] = float(m["loss"])
    assert losses["source"] != losses["target"]
    # mixed is the average of the two halves (same N_vis per half)
    np.testing.assert_allclose(
        losses["mixed"], (losses["source"] + losses["target"]) / 2, rtol=1e-5
    )

    # src_mask row weighting (the multihost-safe form the entry ships) must
    # agree with the static slice — including a PERMUTED layout, which is
    # what multihost global assembly produces and the slice cannot handle.
    # Masks are injected so they travel with their rows (the PRNG-drawn
    # mask noise is position-dependent).
    nv = N_PATCH - int((N_PATCH // T) * 0.5) * T
    idx_rng = np.random.default_rng(11)
    vis_idx = np.stack([
        np.sort(idx_rng.choice(N_PATCH, nv, replace=False)) for _ in range(4)
    ]).astype(np.int32)
    src_mask = np.array([1, 1, 0, 0], np.float32)
    for mode in ("source", "target"):
        step = jax.jit(make_pretrain_train_step(
            student, teacher, num_patches=N_PATCH, frames=T, mask_ratio=0.5,
            source_batch_size=2, clip_loss_data=mode, clip_input_resolution=S,
        ))
        state = TrainState.create(sp, tx)
        _, m_slice = step(state, tp, {"videos": videos, "vis_idx": vis_idx},
                          jax.random.PRNGKey(5))
        _, m_mask = step(state, tp, {"videos": videos, "vis_idx": vis_idx,
                                     "src_mask": src_mask},
                         jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m_mask["loss"]),
                                   float(m_slice["loss"]), rtol=1e-5)
        perm = np.array([0, 2, 1, 3])
        _, m_perm = step(state, tp, {"videos": videos[perm],
                                     "vis_idx": vis_idx[perm],
                                     "src_mask": src_mask[perm]},
                         jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m_perm["loss"]),
                                   float(m_slice["loss"]), rtol=1e-5)


def test_resize_for_teacher():
    v = video(1)
    assert resize_for_teacher(v, S) is v
    out = resize_for_teacher(v, 16)
    assert out.shape == (1, T, 16, 16, 3)


def test_pool_outputs():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8)))
    np.testing.assert_allclose(pool_outputs(x, True), x[:, 0])
    np.testing.assert_allclose(pool_outputs(x, False), x.mean(1), rtol=1e-6)


def test_clip_zero_shot_similarities():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 4, 8))
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt = rng.standard_normal((5, 8))
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    sim = clip_zero_shot_similarities(jnp.asarray(img), jnp.asarray(txt))
    assert sim.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(sim).sum(-1), 1.0, atol=1e-5)


def _stage3_setup(strategy, **kw):
    student = tiny_student()
    teacher = tiny_teacher()
    classifier = nn.Dense(6, name=None)
    b_s = b_t = 4
    videos_s, videos_t = video(b_s, 1), video(b_t, 2)
    tp = teacher.init(jax.random.PRNGKey(0), videos_t[:1])["params"]
    sp = student.init(jax.random.PRNGKey(1), videos_s[:1])["params"]
    hp = classifier.init(jax.random.PRNGKey(2), jnp.zeros((1, 32)))["params"]
    params = {"model": sp, "classifier": hp}
    tx, _ = create_optimizer("adamw", lr=1e-3, params=params, weight_decay=0.0)
    state = TrainState.create(params, tx)
    step = jax.jit(make_selftrain_step(
        student, classifier, teacher, num_patches=N_PATCH, frames=T,
        mask_ratio=0.5, selection_strategy=strategy, nb_classes=6,
        clip_input_resolution=S, **kw,
    ))
    batch = {
        "videos_s": videos_s, "labels_s": jnp.asarray([0, 1, 2, 3]),
        "videos_t": videos_t, "labels_t": jnp.asarray([1, 2, 3, 4]),
        "clip_sim": jax.nn.softmax(
            jnp.asarray(np.random.default_rng(3).standard_normal((b_t, 6))), -1
        ),
        "classwise_thresholds": jnp.full((6,), 0.2),
    }
    return state, tp, batch, step


@pytest.mark.parametrize("strategy", [
    "conf", "cons", "consORconf", "consANDconf", "classwise-conf",
    "clip_only", "clip_matchORconf", "oracle",
])
def test_stage3_strategies_run(strategy):
    state, tp, batch, step = _stage3_setup(strategy)
    state2, m = step(state, tp, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["sel_ratio"]) <= 1.0
    assert 0.0 <= float(m["correct_precision"]) <= 1.0
    # params moved
    before = np.asarray(state.params["classifier"]["kernel"])
    after = np.asarray(state2.params["classifier"]["kernel"])
    assert not np.array_equal(before, after)


def test_stage3_matchORconf_diagnostics():
    state, tp, batch, step = _stage3_setup("clip_matchORconf")
    _, m = step(state, tp, batch, jax.random.PRNGKey(9))
    for key in ("match_select_rate", "conf_select_rate",
                "match_error_rate", "conf_error_rate"):
        assert 0.0 <= float(m[key]) <= 1.0
    # match + conf partitions the selection (conf excludes matches)
    assert float(m["sel_ratio"]) == pytest.approx(
        float(m["match_select_rate"]) + float(m["conf_select_rate"]), abs=1e-6
    )


@pytest.mark.parametrize("strategy", ["conf", "clip_matchORconf", "cons"])
def test_stage3_merged_full_pass_parity(strategy):
    """merge_full_passes=True batches the source + clean-target full-vis
    encoder forwards into one [B_s+B_t] pass with row-wise stop_gradient —
    per-sample compute only (LN, per-row attention), so at drop_path=0 the
    step must reproduce the split-pass metrics and updated params exactly
    (fp32 CPU). A TPU pass-structure experiment (VERDICT r4 #5)."""
    state, tp, batch, step = _stage3_setup(strategy)
    _, _, _, merged = _stage3_setup(strategy, merge_full_passes=True)
    rng = jax.random.PRNGKey(9)
    s_a, m_a = step(state, tp, batch, rng)
    s_b, m_b = merged(state, tp, batch, rng)
    for k in m_a:
        np.testing.assert_allclose(np.asarray(m_a[k]), np.asarray(m_b[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_a.params, s_b.params)


def test_stage3_full_oracle_uses_gt():
    state, tp, batch, step = _stage3_setup("oracle", full_oracle=True)
    _, m = step(state, tp, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss_class_t"]))


def test_stage3_eval_step():
    state, tp, batch, _ = _stage3_setup("conf")
    student = tiny_student()
    classifier = nn.Dense(6)
    ev = jax.jit(make_selftrain_eval_step(student, classifier))
    out = ev(state, {"videos": batch["videos_s"], "labels": batch["labels_s"]})
    assert out["probs"].shape == (4, 6)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, atol=1e-5)


def test_stage1_mask_injection_reproducible():
    """Injected vis_idx bypasses the sampler: identical masks -> identical
    losses (BASELINE.md loss-curve parity protocol)."""
    student = tiny_student()
    teacher = tiny_teacher()
    videos = video(2, seed=9)
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    nv = 8
    sp = student.init(jax.random.PRNGKey(1), videos[:1],
                      jnp.zeros((1, nv), jnp.int32), True)["params"]
    tx, _ = create_optimizer("sgd", lr=0.0, params=sp, momentum=0.0)
    step = jax.jit(make_pretrain_train_step(
        student, teacher, num_patches=N_PATCH, frames=T, mask_ratio=0.5,
        source_batch_size=0, clip_loss_data="mixed", clip_input_resolution=S,
    ))
    vis_idx = jnp.asarray(np.stack([np.arange(nv), np.arange(2, nv + 2)]))
    losses = []
    for rng_seed in (0, 1):  # different rngs, same injected mask
        state = TrainState.create(sp, tx)
        _, m = step(state, tp, {"videos": videos, "vis_idx": vis_idx},
                    jax.random.PRNGKey(rng_seed))
        losses.append(float(m["loss"]))
    assert losses[0] == losses[1]


def test_stage1_teacher_grid_mismatch_raises():
    """A teacher whose patch grid differs from the student's (e.g. clip_l14
    at 224 input: 256/frame vs the /16 student's 196) must fail at trace
    time with a clear error, not NaN — the reference resolves the mismatch
    by resizing the teacher input (run_stage1.py:363-369)."""
    student = tiny_student()
    # patch 8 at the same 32-res input -> 16 patches/frame vs student's 4
    teacher = CLIPVisionTransformer(
        input_resolution=S, patch_size=8, width=32, layers=2, heads=2,
        output_dim=24, return_attn=True, return_index=(0, 1),
    )
    videos = jnp.zeros((2, T, S, S, 3), jnp.float32)
    tp = teacher.init(jax.random.PRNGKey(0), videos[:1])["params"]
    nv = N_PATCH // 2
    sp = student.init(
        jax.random.PRNGKey(1), videos[:1], jnp.zeros((1, nv), jnp.int32), True
    )["params"]
    tx, _ = create_optimizer("adamw", lr=1e-2, params=sp, weight_decay=0.0)
    state = TrainState.create(sp, tx)
    step = jax.jit(make_pretrain_train_step(
        student, teacher, num_patches=N_PATCH, frames=T, mask_ratio=0.5,
        source_batch_size=0, clip_loss_data="target",
        clip_input_resolution=S,
    ))
    with pytest.raises(ValueError, match="patch grid"):
        step(state, tp, {"videos": videos}, jax.random.PRNGKey(2))
