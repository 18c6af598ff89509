"""Tensor-parallel ('model' mesh axis) layout + parity tests.

The reference has no model parallelism (SURVEY §2.3: DDP is its only
strategy); --tp is a beyond-parity option for wide students. These tests
pin (a) the Megatron column/row rules of
``parallel.mesh.tensor_parallel_sharding_tree`` and (b) that a (data,
model) mesh run produces the SAME training trajectory as pure data
parallelism on the same global batch — TP is a layout, never a semantics
change.
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from unite_tpu.engines.finetune import make_finetune_train_step
from unite_tpu.engines.pretrain_umt import make_pretrain_train_step
from unite_tpu.models.adaptation import AdaptationVisionTransformer
from unite_tpu.models.clip import CLIPVisionTransformer
from unite_tpu.models.vit import VisionTransformer
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.parallel.mesh import (
    data_parallel_jit,
    make_mesh,
    model_axis_size,
    replicate,
    shard_batch,
    state_layout,
    tensor_parallel_sharding_tree,
)
from unite_tpu.train.train_state import TrainState


def tiny_model(num_classes=4):
    # dims chosen TP-divisible at tp=2: qkv out 48, mlp hidden 64, heads 2
    return VisionTransformer(
        img_size=16, patch_size=8, embed_dim=16, depth=2, num_heads=2,
        num_classes=num_classes, all_frames=2, tubelet_size=1, qkv_bias=True,
    )


def synthetic_batch(n=16, num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, n)
    videos = rng.standard_normal((n, 2, 16, 16, 3)).astype(np.float32) * 0.1
    videos += labels[:, None, None, None, None] / num_classes
    return {"videos": videos, "labels": labels.astype(np.int32)}


def _state(model, batch, ema=None, lr=1e-2):
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["videos"][:1]))["params"]
    tx, _ = create_optimizer("adamw", lr=lr, params=params, weight_decay=0.0)
    return TrainState.create(params, tx, ema_decay=ema)


def test_tp_layout_rules():
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    assert model_axis_size(mesh) == 2
    assert model_axis_size(make_mesh()) == 1
    batch = synthetic_batch(8)
    state = _state(tiny_model(), batch, ema=0.9)
    layout = tensor_parallel_sharding_tree(state, mesh)

    blk = layout.params["blocks_0"]
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert blk["attn"]["proj"]["kernel"].spec == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
    # biases, LN, head, q/v bias: replicated
    assert blk["attn"]["qkv"].get("bias") is None  # qkv Dense has no bias
    assert blk["attn"]["q_bias"].spec == P()
    assert blk["norm1"]["scale"].spec == P()
    assert layout.params["head"]["kernel"].spec == P()
    # EMA mirrors params; adam moments mirror params (path suffix match)
    assert layout.ema_params["blocks_0"]["attn"]["qkv"]["kernel"].spec == \
        P(None, "model")
    mus = [s for p, s in jax.tree_util.tree_flatten_with_path(
        layout.opt_state)[0]
        if any(getattr(k, "name", "") == "mu" for k in p)
        and [getattr(k, "key", None) for k in p][-3:] ==
        ["attn", "qkv", "kernel"]]
    # at least the two blocks' qkv moments must carry the column spec
    assert mus and all(s.spec == P(None, "model") for s in mus)


def test_tp_zero1_composition():
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    batch = synthetic_batch(8)
    state = _state(tiny_model(), batch)
    layout = tensor_parallel_sharding_tree(state, mesh, zero1_axis="data")
    # params: TP rules only (never zero1-sharded)
    assert layout.params["head"]["kernel"].spec == P()
    # moments of TP params keep the TP spec; moments of replicated params
    # shard over 'data' when a dim divides
    flat = [(tuple(str(getattr(k, "key", getattr(k, "name", "")))
                   for k in p), s.spec) for p, s in
            jax.tree_util.tree_flatten_with_path(layout.opt_state)[0]]
    qkv_specs = [s for p, s in flat if p[-3:] == ("attn", "qkv", "kernel")]
    assert qkv_specs and all(s == P(None, "model") for s in qkv_specs)
    # head kernel [16, 4]: dim0 16 % 4(data) == 0 -> zero1 over data
    head_specs = [s for p, s in flat if p[-2:] == ("head", "kernel")]
    assert head_specs and all(s == P("data", None) for s in head_specs)

    # state_layout dispatch
    assert state_layout(state, mesh, tp=2, zero1=True) is not None
    assert state_layout(state, make_mesh(), tp=1, zero1=False) is None


def _run_steps(state, mesh, step_fn_builder, batches, layout=None,
               extra=(), rng=None):
    batch_argnums = (1 + len(extra),)
    step = data_parallel_jit(step_fn_builder, mesh, state_shardings=layout,
                             batch_argnums=batch_argnums, donate_state=False)
    state = (jax.device_put(state, layout) if layout is not None
             else replicate(state, mesh))
    extra = tuple(replicate(e, mesh) for e in extra)
    rng = rng if rng is not None else jax.random.PRNGKey(7)
    losses = []
    for b in batches:
        sb = shard_batch(b, mesh)
        state, m = step(state, *extra, sb, rng)
        losses.append(float(m["loss"]))
    return state, losses


def test_stage2_tp_trajectory_matches_data_parallel():
    model = tiny_model()
    batches = [synthetic_batch(8, seed=s) for s in range(3)]
    state0 = _state(model, batches[0], ema=0.9)
    build = make_finetune_train_step(model, ema_decay=0.9)

    mesh_dp = make_mesh()  # 8-way data parallel
    mesh_tp = make_mesh(("data", "model"), shape=(4, 2))
    layout = tensor_parallel_sharding_tree(state0, mesh_tp)

    s_dp, l_dp = _run_steps(state0, mesh_dp, build, batches)
    s_tp, l_tp = _run_steps(state0, mesh_tp, build, batches, layout=layout)

    np.testing.assert_allclose(l_dp, l_tp, rtol=2e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_dp.params)[0],
            jax.tree_util.tree_flatten_with_path(s_tp.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4, err_msg=str(pa))
    # EMA too
    ema_dp = np.asarray(s_dp.ema_params["head"]["kernel"])
    ema_tp = np.asarray(s_tp.ema_params["head"]["kernel"])
    np.testing.assert_allclose(ema_dp, ema_tp, atol=2e-5, rtol=2e-4)


def test_stage1_tp_trajectory_matches_data_parallel():
    T, S, PCH = 4, 32, 16
    n_patch = T * (S // PCH) ** 2
    student = AdaptationVisionTransformer(
        img_size=S, patch_size=PCH, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, num_frames=T, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24,
        clip_return_layers=(1,))
    teacher = CLIPVisionTransformer(
        input_resolution=S, patch_size=PCH, width=32, layers=2, heads=2,
        output_dim=24, return_attn=True, return_index=(1,))
    rng = np.random.default_rng(0)
    videos = rng.standard_normal((8, T, S, S, 3)).astype(np.float32)
    tparams = teacher.init(jax.random.PRNGKey(0),
                           jnp.asarray(videos[:1]))["params"]
    nv = n_patch - int((n_patch // T) * 0.5) * T
    sparams = student.init(
        jax.random.PRNGKey(1), jnp.asarray(videos[:1]),
        jnp.zeros((1, nv), jnp.int32), True)["params"]
    tx, _ = create_optimizer("adamw", lr=1e-2, params=sparams,
                             weight_decay=0.0)
    state0 = TrainState.create(sparams, tx)
    build = make_pretrain_train_step(
        student, teacher, num_patches=n_patch, frames=T, mask_ratio=0.5,
        source_batch_size=4, clip_loss_data="mixed",
        clip_input_resolution=S)
    batches = [{"videos": videos}] * 2

    mesh_dp = make_mesh()
    mesh_tp = make_mesh(("data", "model"), shape=(4, 2))
    layout = tensor_parallel_sharding_tree(state0, mesh_tp)

    s_dp, l_dp = _run_steps(state0, mesh_dp, build, batches,
                            extra=(tparams,))
    s_tp, l_tp = _run_steps(state0, mesh_tp, build, batches,
                            layout=layout, extra=(tparams,))
    np.testing.assert_allclose(l_dp, l_tp, rtol=2e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_dp.params)[0],
            jax.tree_util.tree_flatten_with_path(s_tp.params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4, err_msg=str(pa))


_CHILD = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.argv = ["child"]
    import pathlib
    tmp = pathlib.Path(os.environ["CHILD_TMP"])

    from tests.test_entry_resume import _stage2_args  # registers tiny models
    from unite_tpu.train import common
    from unite_tpu.train.run_stage2 import main

    assert jax.device_count() == 8
    args = _stage2_args(tmp, tmp / "out", 1)
    args.tp = 2                # 4 data x 2 model mesh
    args.batch_size = 2        # per-REPLICA -> loader yields 8 rows/step
    args.batch_size_val = 2
    assert common.per_host_batch(args.batch_size, common.tp_ways(args)) == 8
    main(args)

    import json
    with open(tmp / "out" / "log.txt") as f:
        rec = json.loads(f.readline())
    assert "train_loss" in rec and rec["train_loss"] == rec["train_loss"]
    print("TP_ENTRY_OK")
""")


@pytest.mark.slow
def test_stage2_entry_tp2_on_8_fake_devices(tmp_path):
    """run_stage2.main end-to-end on a (4 data x 2 model) mesh: 2-D mesh
    construction, per-replica batch sizing, TP state layout, train + val +
    final_test all execute (beyond-parity scaling path)."""
    env = dict(os.environ)
    env["CHILD_TMP"] = str(tmp_path)
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = f"/root/repo:{env['PYTHONPATH']}"
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "TP_ENTRY_OK" in out.stdout


def test_stage3_tp_trajectory_matches_data_parallel():
    """Stage-3 (the most complex step: teacher attention, committee masks,
    selection dispatch, {model, classifier} param tree) under a 4x2 mesh —
    trailing-path TP rules must match the nested 'model' subtree and leave
    the classifier replicated."""
    import flax.linen as nn

    from unite_tpu.engines.selftrain import make_selftrain_step

    T, S, PCH, NC = 4, 32, 16, 5
    n_patch = T * (S // PCH) ** 2
    student = AdaptationVisionTransformer(
        img_size=S, patch_size=PCH, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, num_frames=T, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24,
        clip_return_layers=(1,))
    teacher = CLIPVisionTransformer(
        input_resolution=S, patch_size=PCH, width=32, layers=2, heads=2,
        output_dim=24, return_attn=True, return_index=(1,))
    classifier = nn.Dense(NC, param_dtype=jnp.float32, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    videos_s = rng.standard_normal((8, T, S, S, 3)).astype(np.float32)
    videos_t = rng.standard_normal((8, T, S, S, 3)).astype(np.float32)
    labels = rng.integers(0, NC, 8).astype(np.int32)
    clip_sim = rng.dirichlet(np.full(NC, 0.5), size=(8,)).astype(np.float32)

    tparams = teacher.init(jax.random.PRNGKey(0),
                           jnp.asarray(videos_s[:1]))["params"]
    nv = n_patch - int((n_patch // T) * 0.5) * T
    sparams = student.init(
        jax.random.PRNGKey(1), jnp.asarray(videos_s[:1]),
        jnp.zeros((1, nv), jnp.int32), True)["params"]
    hparams = classifier.init(jax.random.PRNGKey(2),
                              jnp.zeros((1, 32), jnp.float32))["params"]
    params = {"model": sparams, "classifier": hparams}
    tx, _ = create_optimizer("adamw", lr=1e-2, params=params,
                             weight_decay=0.0)
    state0 = TrainState.create(params, tx)
    build = make_selftrain_step(
        student, classifier, teacher, num_patches=n_patch, frames=T,
        mask_ratio=0.5, selection_strategy="clip_matchORconf", nb_classes=NC,
        clip_input_resolution=S, use_cls_token=False)
    batch = {"videos_s": videos_s, "labels_s": labels,
             "videos_t": videos_t, "labels_t": labels, "clip_sim": clip_sim}

    mesh_dp = make_mesh()
    mesh_tp = make_mesh(("data", "model"), shape=(4, 2))
    layout = tensor_parallel_sharding_tree(state0, mesh_tp)
    # nested student subtree matched; classifier replicated
    assert layout.params["model"]["encoder"]["blocks_0"]["attn"]["qkv"][
        "kernel"].spec == P(None, "model")
    assert layout.params["classifier"]["kernel"].spec == P()

    s_dp, l_dp = _run_steps(state0, mesh_dp, build, [batch] * 2,
                            extra=(tparams,))
    s_tp, l_tp = _run_steps(state0, mesh_tp, build, [batch] * 2,
                            layout=layout, extra=(tparams,))
    np.testing.assert_allclose(l_dp, l_tp, rtol=2e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_dp.params)[0],
            jax.tree_util.tree_flatten_with_path(s_tp.params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4, err_msg=str(pa))
