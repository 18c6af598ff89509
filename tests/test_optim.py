"""Optimizer factory tests: golden parity vs torch optimizers + group rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from unite_tpu.optim.factory import (  # noqa: E402
    create_optimizer,
    get_num_layer_for_vit,
    layer_decay_scales,
    param_group_metadata,
)


def _run_jax(tx, params, grads_seq):
    state = tx.init(params)
    p = params
    for g in grads_seq:
        updates, state = tx.update(g, state, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
    return p


def test_adamw_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    b0 = rng.standard_normal((3,)).astype(np.float32)
    grads_seq = [
        {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((3,)), jnp.float32)}
        for _ in range(5)
    ]
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx, groups = create_optimizer("adamw", lr=1e-2, params=params,
                                  weight_decay=0.05, eps=1e-8)
    got = _run_jax(tx, params, grads_seq)

    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    # bias (1-D) is in the no-decay group, exactly like the reference
    opt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": 0.05},
         {"params": [tb], "weight_decay": 0.0}],
        lr=1e-2, eps=1e-8,
    )
    for g in grads_seq:
        tw.grad = torch.tensor(np.asarray(g["w"]))
        tb.grad = torch.tensor(np.asarray(g["b"]))
        opt.step()
    np.testing.assert_allclose(np.asarray(got["w"]), tw.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["b"]), tb.detach().numpy(), atol=1e-5)


def test_sgd_momentum_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((5, 2)).astype(np.float32)
    grads_seq = [{"w": jnp.asarray(rng.standard_normal((5, 2)), jnp.float32)}
                 for _ in range(4)]
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("momentum", lr=0.1, params=params,
                             weight_decay=0.01, momentum=0.9)
    got = _run_jax(tx, params, grads_seq)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads_seq:
        tw.grad = torch.tensor(np.asarray(g["w"]))
        opt.step()
    np.testing.assert_allclose(np.asarray(got["w"]), tw.detach().numpy(), atol=1e-6)


def test_lr_table_schedule():
    params = {"w": jnp.ones((2, 2))}
    table = np.array([1.0, 0.1, 0.01], np.float32)
    tx, _ = create_optimizer("sgd", lr=table, params=params, momentum=0.0)
    state = tx.init(params)
    g = {"w": jnp.ones((2, 2))}
    p = params
    deltas = []
    for _ in range(4):  # one step past the table end -> clamps to last entry
        updates, state = tx.update(g, state, p)
        deltas.append(float(-updates["w"][0, 0]))
        p = jax.tree.map(lambda a, u: a + u, p, updates)
    np.testing.assert_allclose(deltas, [1.0, 0.1, 0.01, 0.01], rtol=1e-6)


def test_layer_decay_scales_formula():
    # decay^(num_layers+1-i), i in 0..num_layers+1 (run_stage2.py:616)
    s = layer_decay_scales(0.5, 2)
    np.testing.assert_allclose(s, [0.125, 0.25, 0.5, 1.0])


def test_get_num_layer_for_vit_paths():
    n = 14  # depth 12 -> scales len 14
    assert get_num_layer_for_vit(("cls_token",), n) == 0
    assert get_num_layer_for_vit(("patch_embed", "proj", "kernel"), n) == 0
    assert get_num_layer_for_vit(("blocks_3", "attn", "qkv", "kernel"), n) == 4
    assert get_num_layer_for_vit(("encoder", "blocks_0", "norm1", "scale"), n) == 1
    assert get_num_layer_for_vit(("resblocks_11", "ln_1", "scale"), n) == 12
    assert get_num_layer_for_vit(("head", "kernel"), n) == n - 1
    assert get_num_layer_for_vit(("fc_norm", "scale"), n) == n - 1


def test_param_group_metadata_rules():
    params = {
        "cls_token": jnp.zeros((1, 1, 8)),
        "patch_embed": {"proj": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros(8)}},
        "blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24))},
                              "q_bias": jnp.zeros(8)}},
        "head": {"kernel": jnp.zeros((8, 5)), "bias": jnp.zeros(5)},
    }
    wd_mask, lr_scale, groups = param_group_metadata(
        params, weight_decay=0.05, num_layers=1, layer_decay=0.5,
    )
    assert wd_mask["cls_token"] is False  # skip list
    assert wd_mask["patch_embed"]["proj"]["kernel"] is True
    assert wd_mask["patch_embed"]["proj"]["bias"] is False
    assert wd_mask["blocks_0"]["attn"]["q_bias"] is False
    # layer scales: depth=1 -> scales [d^2, d^1, 1.0]; patch_embed layer 0,
    # blocks_0 layer 1, head last
    assert lr_scale["patch_embed"]["proj"]["kernel"] == 0.25
    assert lr_scale["blocks_0"]["attn"]["qkv"]["kernel"] == 0.5
    assert lr_scale["head"]["kernel"] == 1.0


def test_trainable_mask_freezes():
    params = {"a": jnp.ones((2, 2)), "b": jnp.ones((2, 2))}
    mask = {"a": False, "b": True}
    tx, groups = create_optimizer("sgd", lr=1.0, params=params, momentum=0.0,
                                  trainable_mask=mask)
    state = tx.init(params)
    g = {"a": jnp.ones((2, 2)), "b": jnp.ones((2, 2))}
    updates, _ = tx.update(g, state, params)
    assert float(jnp.abs(updates["a"]).max()) == 0.0
    assert float(jnp.abs(updates["b"]).max()) == 1.0
    assert "frozen" in groups


# --------------------------------------------------------------------------
# Full reference --opt surface (optim_factory.py:121-211; VERDICT r3 item 5)
# --------------------------------------------------------------------------

REFERENCE_OPT_NAMES = [
    # every name the reference's create_optimizer dispatches on
    "sgd", "nesterov", "momentum", "adam", "adamw", "nadam", "radam",
    "adamp", "sgdp", "adadelta", "adafactor", "adahessian", "rmsprop",
    "rmsproptf", "novograd", "nvnovograd", "fusedsgd", "fusedmomentum",
    "fusedadam", "fusedadamw", "fusedlamb", "fusednovograd",
    "lookahead_adamw", "lookahead_sgd",
]


@pytest.mark.parametrize("name", REFERENCE_OPT_NAMES)
def test_every_reference_opt_builds_or_errors_intelligibly(name):
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    if name == "adahessian":
        with pytest.raises(NotImplementedError, match="supported"):
            create_optimizer(name, lr=1e-3, params=params)
        return
    tx, _ = create_optimizer(name, lr=1e-3, params=params, weight_decay=0.01)
    grads = [{"w": jnp.full((4, 3), 0.1), "b": jnp.full((3,), 0.1)}] * 3
    got = _run_jax(tx, params, grads)
    for leaf in jax.tree.leaves(got):
        assert np.isfinite(np.asarray(leaf)).all(), name


def test_unknown_opt_lists_supported():
    with pytest.raises(ValueError, match="supported"):
        create_optimizer("zoomzoom", lr=1e-3, params={"w": jnp.ones((2, 2))})


def test_sgd_is_nesterov_like_reference():
    """Reference 'sgd' builds torch SGD with nesterov=True
    (optim_factory.py:153-156); 'momentum' is the plain variant."""
    rng = np.random.default_rng(4)
    w0 = rng.standard_normal((5, 2)).astype(np.float32)
    grads_seq = [{"w": jnp.asarray(rng.standard_normal((5, 2)), jnp.float32)}
                 for _ in range(4)]
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("sgd", lr=0.1, params=params,
                             weight_decay=0.01, momentum=0.9)
    got = _run_jax(tx, params, grads_seq)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, nesterov=True,
                          weight_decay=0.01)
    for g in grads_seq:
        tw.grad = torch.tensor(np.asarray(g["w"]))
        opt.step()
    np.testing.assert_allclose(np.asarray(got["w"]), tw.detach().numpy(),
                               atol=1e-6)


def test_rmsprop_matches_torch():
    """torch.optim.RMSprop(alpha=0.9, momentum, L2 wd) parity — eps sits
    OUTSIDE the sqrt in torch (vs TF-style inside for rmsproptf)."""
    rng = np.random.default_rng(5)
    w0 = (rng.standard_normal((3, 4)).astype(np.float32)) * 0.5
    grads_seq = [{"w": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)}
                 for _ in range(5)]
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("rmsprop", lr=0.01, params=params,
                             weight_decay=0.01, momentum=0.9, eps=1e-8)
    got = _run_jax(tx, params, grads_seq)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.RMSprop([tw], lr=0.01, alpha=0.9, momentum=0.9,
                              weight_decay=0.01, eps=1e-8)
    for g in grads_seq:
        tw.grad = torch.tensor(np.asarray(g["w"]))
        opt.step()
    np.testing.assert_allclose(np.asarray(got["w"]), tw.detach().numpy(),
                               rtol=2e-5, atol=1e-6)


def test_novograd_two_steps_manual():
    """NovoGrad recurrence hand-rolled (Ginsburg et al. 2019 alg. 1):
    v_0=||g||^2, v_t=b2 v+(1-b2)||g||^2, m_t=b1 m+(g/(sqrt(v)+eps)+wd p)."""
    b1, b2, eps, wd, lr = 0.95, 0.98, 1e-8, 0.01, 0.1
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    g1 = np.array([[0.1, 0.2], [-0.3, 0.4]], np.float32)
    g2 = np.array([[-0.2, 0.1], [0.2, -0.1]], np.float32)
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("novograd", lr=lr, params=params,
                             weight_decay=wd)
    got = _run_jax(tx, params, [{"w": jnp.asarray(g1)}, {"w": jnp.asarray(g2)}])

    v = float((g1 * g1).sum())
    m = g1 / (np.sqrt(v) + eps) + wd * w0
    w = w0 - lr * m
    v = b2 * v + (1 - b2) * float((g2 * g2).sum())
    m = b1 * m + (g2 / (np.sqrt(v) + eps) + wd * w)
    w = w - lr * m
    np.testing.assert_allclose(np.asarray(got["w"]), w, rtol=1e-5, atol=1e-6)


def test_adamp_projection_tangent():
    """When the gradient is orthogonal to a 2-D weight (the scale-invariant
    case), AdamP's projected update must stay in the tangent space:
    <p, u> ~ 0 per output channel, and the weight norm must grow more
    slowly than under plain adamw."""
    w0 = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]], np.float32)
    # per-channel orthogonal gradient
    g = np.array([[0.0, 0.3, -0.1], [0.1, 0.0, 0.2]], np.float32)
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("adamp", lr=0.1, params=params, weight_decay=0.0)
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    u = np.asarray(updates["w"])
    dots = (w0 * u).sum(axis=1) / (np.linalg.norm(w0, axis=1)
                                   * np.linalg.norm(u, axis=1) + 1e-12)
    assert np.all(np.abs(dots) < 1e-4), dots


def test_sgdp_runs_and_decreases_quadratic():
    params = {"w": jnp.asarray(np.ones((4, 4), np.float32))}
    tx, _ = create_optimizer("sgdp", lr=0.05, params=params,
                             weight_decay=0.01, momentum=0.9)
    state = tx.init(params)
    p = params
    losses = []
    for _ in range(20):
        g = {"w": 2 * p["w"]}  # d/dw ||w||^2
        losses.append(float((p["w"] ** 2).sum()))
        u, state = tx.update(g, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, u)
    assert losses[-1] < 0.25 * losses[0], losses[::5]


def test_lookahead_sync_semantics():
    """lookahead_momentum with momentum=0 == plain SGD fast steps; at step
    k=6 the params must land on slow + alpha*(fast - slow)."""
    lr, alpha, k = 0.1, 0.5, 6
    w0 = np.array([2.0, -1.0], np.float32)
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("lookahead_momentum", lr=lr, params=params,
                             weight_decay=0.0, momentum=0.0)
    state = tx.init(params)
    p = params
    g = {"w": jnp.asarray(np.array([1.0, 1.0], np.float32))}
    fast = w0.copy()
    for step in range(1, k + 1):
        u, state = tx.update(g, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, u)
        fast = fast - lr * np.array([1.0, 1.0])
    expect = w0 + alpha * (fast - w0)  # slow synced at step k
    np.testing.assert_allclose(np.asarray(p["w"]), expect, rtol=1e-6)
    # and the fast weights were reset to the slow ones
    u, state = tx.update(g, state, p)
    p2 = jax.tree.map(lambda a, b: a + b, p, u)
    np.testing.assert_allclose(np.asarray(p2["w"]),
                               expect - lr * np.array([1.0, 1.0]), rtol=1e-6)


def test_mu_dtype_bf16_state_and_trajectory():
    """--mu_dtype bfloat16: first moment stored bf16 (HBM traffic lever,
    tools/stage2_probe.py); trajectory stays close to fp32 state."""
    params = {"w": jnp.ones((8, 4)) * 0.3}
    tx32, _ = create_optimizer("adamw", lr=1e-3, params=params,
                               weight_decay=0.01)
    tx16, _ = create_optimizer("adamw", lr=1e-3, params=params,
                               weight_decay=0.01, mu_dtype=jnp.bfloat16)
    s16 = tx16.init(params)
    mus = [l for l in jax.tree.leaves(s16)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment found in opt state"
    grads = [{"w": jnp.full((8, 4), 0.05)}] * 5
    got32 = _run_jax(tx32, params, grads)
    got16 = _run_jax(tx16, params, grads)
    np.testing.assert_allclose(np.asarray(got16["w"]),
                               np.asarray(got32["w"]), rtol=0, atol=1e-4)


def test_sgdp_wd_matches_timm_formula():
    """timm sgdp.py applies p *= 1 - lr*wd*wd_ratio/(1-momentum) — the
    1/(1-momentum) factor compensates the momentum-amplified step scale
    (ADVICE r4). Pinned on a 2-D weight with g ∥ p so the projection never
    fires (ratio=1) and the closed form is exact."""
    lr, wd, mom = 0.05, 0.04, 0.9
    w0 = np.array([[1.0, 2.0], [3.0, -1.0]], np.float32)
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("sgdp", lr=lr, params=params,
                             weight_decay=wd, momentum=mom)
    state = tx.init(params)
    p, buf = w0.copy(), np.zeros_like(w0)
    jp = params
    for _ in range(3):
        g = 0.1 * p  # parallel to p: cos=1, projection is a no-op
        u, state = tx.update({"w": jnp.asarray(g)}, state, jp)
        jp = jax.tree.map(lambda a, b: a + b, jp, u)
        buf = mom * buf + g
        d_p = g + mom * buf  # nesterov
        p = p - lr * (d_p + wd / (1.0 - mom) * p)
    np.testing.assert_allclose(np.asarray(jp["w"]), p, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["nadam", "adadelta", "adagrad"])
def test_coupled_wd_equals_l2_in_grad(name):
    """timm Nadam / torch Adadelta & Adagrad fold L2 into the gradient
    BEFORE the moment statistics (ADVICE r4: these were decoupled). Pinned
    structurally: wd=X must equal wd=0 with X*p added to the grads."""
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    wd = 0.05
    params = {"w": jnp.asarray(w0)}
    tx_wd, _ = create_optimizer(name, lr=0.1, params=params, weight_decay=wd)
    tx_0, _ = create_optimizer(name, lr=0.1, params=params, weight_decay=0.0)
    rng = np.random.default_rng(3)
    gs = [rng.standard_normal(w0.shape).astype(np.float32) for _ in range(3)]

    s_wd, s_0 = tx_wd.init(params), tx_0.init(params)
    p_wd, p_0 = params, params
    for g in gs:
        u, s_wd = tx_wd.update({"w": jnp.asarray(g)}, s_wd, p_wd)
        p_wd = jax.tree.map(lambda a, b: a + b, p_wd, u)
        g0 = {"w": jnp.asarray(g) + wd * p_0["w"]}
        u, s_0 = tx_0.update(g0, s_0, p_0)
        p_0 = jax.tree.map(lambda a, b: a + b, p_0, u)
    np.testing.assert_allclose(np.asarray(p_wd["w"]), np.asarray(p_0["w"]),
                               rtol=1e-6, atol=1e-7)


def test_adadelta_matches_torch():
    """torch.optim.Adadelta golden parity incl. coupled L2 weight decay."""
    w0 = np.array([[0.8, -1.5], [2.0, 0.3]], np.float32)
    params = {"w": jnp.asarray(w0)}
    tx, _ = create_optimizer("adadelta", lr=0.7, params=params,
                             weight_decay=0.03, eps=1e-6)
    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adadelta([tw], lr=0.7, rho=0.9, eps=1e-6,
                               weight_decay=0.03)
    rng = np.random.default_rng(5)
    jp, state = params, tx.init(params)
    for _ in range(4):
        g = rng.standard_normal(w0.shape).astype(np.float32)
        u, state = tx.update({"w": jnp.asarray(g)}, state, jp)
        jp = jax.tree.map(lambda a, b: a + b, jp, u)
        tw.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(np.asarray(jp["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_novograd_betas_default_and_override():
    """betas=None resolves to NovoGrad's canonical (0.95, 0.98) (reference
    passes betas only when --opt_betas is set — optim_factory.py:146-147),
    while an explicit pair overrides (ADVICE r4: the old sentinel treated
    the CLI default (0.9, 0.95) as an override)."""
    params = {"w": jnp.asarray(np.ones((2, 2), np.float32))}
    g = [{"w": jnp.full((2, 2), 0.1)}] * 2
    tx_none, _ = create_optimizer("novograd", lr=0.1, params=params)
    tx_can, _ = create_optimizer("novograd", lr=0.1, params=params,
                                 betas=(0.95, 0.98))
    tx_ovr, _ = create_optimizer("novograd", lr=0.1, params=params,
                                 betas=(0.5, 0.9))
    a = _run_jax(tx_none, params, g)
    b = _run_jax(tx_can, params, g)
    c = _run_jax(tx_ovr, params, g)
    np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
    assert not np.allclose(np.asarray(a["w"]), np.asarray(c["w"]))


def test_args_opt_betas_default_is_none():
    """args.py must mirror the reference argparse default (run_stage2.py:95
    opt_betas=None); the shipped YAMLs supply the per-stage pairs."""
    from unite_tpu.train.args import stage2_parser
    a = stage2_parser().parse_args([])
    assert a.opt_betas is None


def test_update_freq_clips_accumulated_gradient():
    """--update_freq with --clip_grad must clip the AVERAGED gradient once
    per optimizer step (reference engine_for_finetuning.py:109-126), not
    each micro-batch: mean-of-clipped != clip-of-mean (ADVICE r4)."""
    import optax
    from unite_tpu.train.common import wrap_update_freq

    lr, c = 0.1, 1.0
    w0 = {"w": jnp.asarray([3.0, 4.0])}
    # micro grads: one tiny, one huge — per-micro clipping would rescale
    # only the huge one BEFORE averaging
    g1 = {"w": jnp.asarray([0.0, 0.1])}
    g2 = {"w": jnp.asarray([30.0, 40.0])}
    tx = wrap_update_freq(optax.sgd(lr), update_freq=2, clip_grad=c)
    state = tx.init(w0)
    p = w0
    for g in (g1, g2):
        u, state = tx.update(g, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, u)
    mean = (np.asarray(g1["w"]) + np.asarray(g2["w"])) / 2.0
    clipped = mean * min(1.0, c / np.linalg.norm(mean))
    np.testing.assert_allclose(np.asarray(p["w"]),
                               np.asarray(w0["w"]) - lr * clipped,
                               rtol=1e-5, atol=1e-6)


def test_resume_best_acc_zero_survives():
    """best_acc == 0.0 in the payload must resume as 0.0, not the -1.0
    no-record sentinel (ADVICE r4 falsy-zero)."""
    from unite_tpu.train.common import resume_best_acc
    assert resume_best_acc({"extra": {"best_acc": 0.0}}) == 0.0
    assert resume_best_acc({"extra": {}}) == -1.0
    assert resume_best_acc(None) == -1.0
