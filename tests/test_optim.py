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
