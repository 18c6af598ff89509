"""Stage-2 engine integration tests on the 8-fake-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.engines.finetune import (
    make_eval_step,
    make_finetune_train_step,
    merge,
    write_preds_file,
)
from unite_tpu.models.vit import VisionTransformer
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.parallel.mesh import data_parallel_jit, make_mesh, shard_batch
from unite_tpu.train.train_state import TrainState


def tiny_model(num_classes=4):
    return VisionTransformer(
        img_size=16, patch_size=8, embed_dim=16, depth=1, num_heads=2,
        num_classes=num_classes, all_frames=2, tubelet_size=1, qkv_bias=True,
    )


def synthetic_batch(n=16, num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, n)
    # class-dependent mean so the task is learnable
    videos = rng.standard_normal((n, 2, 16, 16, 3)).astype(np.float32) * 0.1
    videos += labels[:, None, None, None, None] / num_classes
    return {"videos": videos, "labels": labels.astype(np.int32)}


def test_dp_training_decreases_loss_on_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    model = tiny_model()
    batch = synthetic_batch()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["videos"][:1])
    )["params"]
    tx, _ = create_optimizer("adamw", lr=1e-2, params=params, weight_decay=0.0)
    state = TrainState.create(params, tx)
    train_step = data_parallel_jit(
        make_finetune_train_step(model), mesh
    )
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        sb = shard_batch(synthetic_batch(seed=i % 3), mesh)
        state, metrics = train_step(state, sb, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_ema_tracks_params():
    model = tiny_model()
    batch = synthetic_batch(8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["videos"][:1]))["params"]
    tx, _ = create_optimizer("sgd", lr=0.1, params=params, momentum=0.0)
    state = TrainState.create(params, tx, ema_decay=0.9)
    step = make_finetune_train_step(model, ema_decay=0.9)
    state2, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                     jax.random.PRNGKey(1))
    p = np.asarray(state2.params["head"]["kernel"])
    e = np.asarray(state2.ema_params["head"]["kernel"])
    p0 = np.asarray(state.params["head"]["kernel"])
    np.testing.assert_allclose(e, 0.9 * p0 + 0.1 * p, atol=1e-6)


def test_ema_updates_only_at_multisteps_boundary():
    """timm ModelEma parity under grad accumulation: the reference updates
    the EMA once per OPTIMIZER step (engine_for_finetuning.py:109-126);
    with optax.MultiSteps the EMA must stay frozen on intermediate micro
    steps (params are unchanged there — decaying toward them again would
    compound decay^update_freq per optimizer step)."""
    import optax

    model = tiny_model()
    batch = synthetic_batch(8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["videos"][:1]))["params"]
    tx, _ = create_optimizer("sgd", lr=0.1, params=params, momentum=0.0)
    # chain-wrap MultiSteps so it is NOT the outermost transform: the
    # boundary detection must find it by opt-state traversal, not type
    tx = optax.chain(optax.MultiSteps(tx, every_k_schedule=2),
                     optax.identity())
    state = TrainState.create(params, tx, ema_decay=0.5)
    step = make_finetune_train_step(model, ema_decay=0.5)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    p0 = np.asarray(state.params["head"]["kernel"])
    # micro step 1: mid-accumulation — params AND ema unchanged
    state1, _ = step(state, jb, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(state1.params["head"]["kernel"]), p0)
    np.testing.assert_array_equal(
        np.asarray(state1.ema_params["head"]["kernel"]), p0)
    # micro step 2: boundary — params update, ema takes ONE decay step
    state2, _ = step(state1, jb, jax.random.PRNGKey(1))
    p2 = np.asarray(state2.params["head"]["kernel"])
    assert not np.array_equal(p2, p0)
    np.testing.assert_allclose(
        np.asarray(state2.ema_params["head"]["kernel"]),
        0.5 * p0 + 0.5 * p2, atol=1e-6)


def test_eval_step_outputs():
    model = tiny_model()
    batch = synthetic_batch(8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["videos"][:1]))["params"]
    tx, _ = create_optimizer("sgd", lr=0.1, params=params)
    state = TrainState.create(params, tx)
    out = make_eval_step(model)(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert out["probs"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, atol=1e-5)
    assert 0.0 <= float(out["acc1"]) <= 100.0


def test_grad_accumulation_multisteps():
    import optax
    model = tiny_model()
    batch = synthetic_batch(8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["videos"][:1]))["params"]
    tx, _ = create_optimizer("sgd", lr=0.1, params=params, momentum=0.0)
    tx = optax.MultiSteps(tx, every_k_schedule=2)
    state = TrainState.create(params, tx)
    step = make_finetune_train_step(model)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, _ = step(state, jb, jax.random.PRNGKey(1))
    # first micro-step: params unchanged (accumulating)
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]),
    )
    s2, _ = step(s1, jb, jax.random.PRNGKey(1))
    assert not np.allclose(
        np.asarray(s2.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]),
    )


def test_merge_multi_view(tmp_path):
    # video A: 2 views (+1 duplicate) agreeing on class 1; video B: class 0
    a1 = np.array([0.1, 0.8, 0.1])
    a2 = np.array([0.2, 0.5, 0.3])
    b1 = np.array([0.9, 0.05, 0.05])
    write_preds_file(str(tmp_path / "0.txt"),
                     [("vidA", a1, 1, 0, 0), ("vidA", a2, 1, 1, 0)])
    write_preds_file(str(tmp_path / "1.txt"),
                     [("vidA", a1, 1, 0, 0),  # duplicate view, must dedupe
                      ("vidB", b1, 0, 0, 0)])
    top1, top5 = merge(str(tmp_path), num_tasks=2)
    assert top1 == 100.0
    assert top5 == 100.0

    # wrong label -> top1 drops
    write_preds_file(str(tmp_path / "0.txt"), [("vidC", b1, 2, 0, 0)])
    top1, _ = merge(str(tmp_path), num_tasks=2)
    assert abs(top1 - 100.0 * 2 / 3) < 1e-6


def test_mixup_soft_targets():
    from unite_tpu.ops.mixup import Mixup
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=4,
                label_smoothing=0.1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 2, 16, 16, 3)),
                    jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    mixed, targets = mix(jax.random.PRNGKey(0), x, labels)
    assert mixed.shape == x.shape
    assert targets.shape == (6, 4)
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)


def test_eval_probs_are_softmax_of_loss_logits():
    """run_validation recomputes the last-batch CE host-side as
    -log(probs[label]) over the SLICED probs (train/common.py) — valid only
    if the eval step's ``probs`` are the softmax of the very logits its
    ``loss`` uses. Pin that invariant on the eval step."""
    model = tiny_model()
    rng = np.random.default_rng(5)
    videos = jnp.asarray(rng.normal(size=(6, 2, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), videos)["params"]
    state = TrainState.create(
        params, create_optimizer("adamw", lr=1e-3, params=params)[0])
    out = make_eval_step(model)(state, {"videos": videos, "labels": labels})
    probs = np.asarray(out["probs"], np.float64)
    nll = -np.log(probs[np.arange(6), np.asarray(labels)])
    np.testing.assert_allclose(nll.mean(), float(out["loss"]),
                               atol=1e-5, rtol=1e-5)


def test_mixup_elem_mode():
    from unite_tpu.ops.mixup import Mixup
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, mode="elem", num_classes=4)
    x = jnp.ones((4, 2, 16, 16, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, targets = mix(jax.random.PRNGKey(0), x, labels)
    assert mixed.shape == x.shape
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)


def test_mixup_pair_mode_symmetry():
    """Pair mode (reference mixup.py:178-200): i and B-1-i share one lam and
    one box, so the pair's two mixed rows use mirrored coefficients."""
    from unite_tpu.ops.mixup import Mixup
    # mixup only (no cutmix) so the mixing is a pure convex combination
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, mode="pair",
                num_classes=4, label_smoothing=0.0, prob=1.0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((6, 1, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    mixed, targets = mix(jax.random.PRNGKey(3), x, labels)
    m = np.asarray(mixed, np.float64)
    xo = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)
    for i in range(6):
        j = 5 - i
        # solve m[i] = lam*x[i] + (1-lam)*x[j] for lam, check partner
        denom = (xo[i] - xo[j]).ravel()
        k = np.argmax(np.abs(denom))
        lam_i = ((m[i].ravel() - xo[j].ravel()) / denom)[k]
        # m[j] = lam*x[j] + (1-lam)*x[i]  =>  lam = (x[i]-m[j])/(x[i]-x[j])
        lam_j = ((xo[i].ravel() - m[j].ravel()) / denom)[k]
        assert abs(lam_i - lam_j) < 1e-4  # shared pair lam
        np.testing.assert_allclose(
            m[i], lam_i * xo[i] + (1 - lam_i) * xo[j], atol=1e-4)


def test_mixup_pair_mode_odd_batch_middle_untouched():
    """Odd batch in pair mode: the reference's range(B//2) loop never
    visits the middle sample, so it passes through unmixed with a hard
    one-hot target (mixup.py:178-200)."""
    from unite_tpu.ops.mixup import Mixup
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, mode="pair",
                num_classes=4, label_smoothing=0.0, prob=1.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, 1, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0])
    mixed, targets = mix(jax.random.PRNGKey(5), x, labels)
    np.testing.assert_allclose(np.asarray(mixed)[2], np.asarray(x)[2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(targets)[2],
                               np.eye(4, dtype=np.float32)[2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)


def test_mixup_cutmix_minmax_box_bounds():
    """cutmix_minmax (reference mixup.py:66-96,131-134): box side lengths
    are uniform fractions within the bounds and lam is the exact area."""
    from unite_tpu.ops.mixup import Mixup
    mix = Mixup(mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.25, 0.5),
                mode="elem", num_classes=4, label_smoothing=0.0, prob=1.0)
    h = w = 32
    x = jnp.zeros((4, 1, h, w, 1))
    x = x.at[2:].set(1.0)  # flip partners differ -> box visible in output
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, targets = mix(jax.random.PRNGKey(5), x, labels)
    m = np.asarray(mixed)[:, 0, :, :, 0]
    t = np.asarray(targets)
    for i in range(4):
        box = m[i] != (0.0 if i < 2 else 1.0)
        rows = box.any(1).sum()
        cols = box.any(0).sum()
        assert int(h * 0.25) <= rows < int(h * 0.5)
        assert int(w * 0.25) <= cols < int(w * 0.5)
        # lam in targets equals 1 - exact box area fraction
        lam = 1.0 - rows * cols / (h * w)
        own = t[i, labels[i]]
        np.testing.assert_allclose(own, lam, atol=1e-5)


def test_mixup_prob_gate_suppresses_minmax_box():
    """Samples excluded by the prob gate must come back untouched even with
    cutmix_minmax, whose box is drawn independent of lam (the reference
    returns early with lam=1 before drawing any box, mixup.py:152-155)."""
    from unite_tpu.ops.mixup import Mixup
    mix = Mixup(mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.3, 0.6),
                mode="elem", num_classes=4, label_smoothing=0.0, prob=0.0)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (4, 1, 16, 16, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, targets = mix(jax.random.PRNGKey(9), x, labels)
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(targets), np.eye(4)[np.asarray(labels)], atol=1e-6)


def test_zero1_sharded_optimizer_matches_replicated():
    """ZeRO-1 layout produces the same training trajectory as replicated."""
    from unite_tpu.parallel.mesh import (
        data_parallel_jit,
        make_mesh,
        shard_batch,
        shard_state_zero1,
        zero1_sharding_tree,
    )

    mesh = make_mesh()
    model = tiny_model()
    batch = synthetic_batch(16)

    def make_state():
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(batch["videos"][:1]))["params"]
        tx, _ = create_optimizer("adamw", lr=1e-2, params=params,
                                 weight_decay=0.01)
        return TrainState.create(params, tx)

    rng = jax.random.PRNGKey(1)
    sb = shard_batch(batch, mesh)

    # replicated baseline
    s_rep = make_state()
    step_rep = data_parallel_jit(make_finetune_train_step(model), mesh,
                                 donate_state=False)
    for _ in range(3):
        s_rep, m_rep = step_rep(s_rep, sb, rng)

    # ZeRO-1 sharded optimizer state
    s_z = shard_state_zero1(make_state(), mesh)
    layout = zero1_sharding_tree(s_z, mesh)
    step_z = data_parallel_jit(make_finetune_train_step(model), mesh,
                               donate_state=False, state_shardings=layout)
    for _ in range(3):
        s_z, m_z = step_z(s_z, sb, rng)

    assert float(m_rep["loss"]) == pytest.approx(float(m_z["loss"]), rel=1e-5)
    a = np.asarray(s_rep.params["head"]["kernel"])
    b = np.asarray(s_z.params["head"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-6)
    # at least one optimizer moment is actually sharded over 'data'
    specs = [str(leaf.sharding.spec) for leaf in jax.tree.leaves(s_z.opt_state)
             if hasattr(leaf, "sharding")]
    assert any("data" in s for s in specs), specs


def test_fsdp_sharded_state_matches_replicated():
    """FSDP (ZeRO-3) layout — params, EMA and moments all sharded over the
    data axis — produces the same training trajectory as replicated DDP:
    GSPMD's all-gather-at-use / reduce-scatter-grads is a placement
    change, not a semantics change."""
    from unite_tpu.parallel.mesh import (
        data_parallel_jit,
        fsdp_sharding_tree,
        make_mesh,
        shard_batch,
        state_layout,
    )

    mesh = make_mesh()
    model = tiny_model()
    batch = synthetic_batch(16)

    def make_state():
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(batch["videos"][:1]))["params"]
        tx, _ = create_optimizer("adamw", lr=1e-2, params=params,
                                 weight_decay=0.01)
        return TrainState.create(params, tx, ema_decay=0.9)

    rng = jax.random.PRNGKey(1)
    sb = shard_batch(batch, mesh)

    s_rep = make_state()
    step_rep = data_parallel_jit(
        make_finetune_train_step(model, ema_decay=0.9), mesh,
        donate_state=False)
    for _ in range(3):
        s_rep, m_rep = step_rep(s_rep, sb, rng)

    s_f = make_state()
    layout = fsdp_sharding_tree(s_f, mesh)
    s_f = jax.device_put(s_f, layout)
    step_f = data_parallel_jit(
        make_finetune_train_step(model, ema_decay=0.9), mesh,
        donate_state=False, state_shardings=layout)
    for _ in range(3):
        s_f, m_f = step_f(s_f, sb, rng)

    assert float(m_rep["loss"]) == pytest.approx(float(m_f["loss"]), rel=1e-5)
    for key in ("params", "ema_params"):
        a = np.asarray(getattr(s_rep, key)["head"]["kernel"])
        b = np.asarray(getattr(s_f, key)["head"]["kernel"])
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=key)
    # params themselves are sharded over 'data' (the ZeRO-3 property)
    specs = [str(leaf.sharding.spec) for leaf in jax.tree.leaves(s_f.params)
             if hasattr(leaf, "sharding")]
    assert any("data" in s for s in specs), specs
    # dispatch: --fsdp routes through state_layout
    assert state_layout(make_state(), mesh, fsdp=True) is not None
