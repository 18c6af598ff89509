"""Real 2-process FSDP and TP steps (VERDICT r4 item 6).

tests/test_distributed_2proc.py pins plain DP across two real processes;
the FSDP/TP layout trees were only ever exercised on a single-process
8-fake-device mesh (MULTICHIP dryrun) plus monkeypatched process_count
tests. This spawns 2 actual processes x 2 local CPU devices each (a 4-device
world), runs ONE finetune train step under ``--fsdp`` (ZeRO-3 tree) and
under ``--tp 2`` (Megatron column/row tree on a 2x2 (data, model) mesh)
with cross-process batch assembly, saves the sharded state through the
collective checkpoint gather, and compares the resulting params BITWISE-
tolerance against an identical single-process 4-device run — the one
layout class the single-process dryrun cannot see (cross-process
all-gather/reduce-scatter layouts and per-process batch slices)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    mode, coord, pid, out_dir = (sys.argv[1], sys.argv[2], int(sys.argv[3]),
                                 sys.argv[4])
    if pid >= 0:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=2, process_id=pid)
        assert jax.process_count() == 2 and jax.device_count() == 4
        assert len(jax.local_devices()) == 2
    else:
        assert jax.device_count() == 4  # single-process reference world

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from unite_tpu.engines.finetune import make_finetune_train_step
    from unite_tpu.models.vit import VisionTransformer
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.parallel import mesh as pmesh
    from unite_tpu.train.train_state import TrainState
    from unite_tpu.utils import checkpoint as ck

    T, S = 2, 32
    model = VisionTransformer(
        img_size=S, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=4, qkv_bias=True, num_classes=5, all_frames=T,
        tubelet_size=1, use_mean_pooling=True,
        use_pallas=False,  # TP: no GSPMD rule for pallas calls
    )
    if mode == "tp":
        mesh = pmesh.make_mesh(("data", "model"), shape=(2, 2))
        tp, fsdp = 2, False
    else:
        mesh = pmesh.make_mesh()
        tp, fsdp = 1, True

    example = jnp.zeros((1, T, S, S, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), example)["params"]
    tx, _ = create_optimizer("adamw", lr=1e-2, params=params,
                             weight_decay=0.05)
    state = TrainState.create(params, tx)
    layout = pmesh.state_layout(state, mesh, tp=tp, fsdp=fsdp)
    assert layout is not None
    step = pmesh.data_parallel_jit(
        make_finetune_train_step(model), mesh, state_argnums=(0,),
        batch_argnums=(1,), donate_state=True, state_shardings=layout)
    state = jax.device_put(state, layout)

    # fixed global batch of 8; each PROCESS feeds its contiguous half
    # (cross-process batch assembly under the data axis of size 2)
    rng = np.random.default_rng(3)
    g_videos = rng.normal(size=(8, T, S, S, 3)).astype(np.float32)
    g_labels = (np.arange(8) % 5).astype(np.int32)
    sl = pmesh.local_batch_slice(8) if pid >= 0 else slice(None)
    batch = pmesh.shard_batch(
        {"videos": g_videos[sl], "labels": g_labels[sl]}, mesh)
    assert batch["videos"].shape[0] == 8  # global

    state, m = step(state, batch, jax.random.PRNGKey(1))
    loss = float(m["loss"])
    print(f"proc {pid} [{mode}]: loss={loss:.6f}")

    io = ck.AsyncCheckpointer()
    io.save_train_state(out_dir, 0, state, tags=("latest",))
    io.wait()
    if pid > 0:
        multihost_utils.sync_global_devices("done")
    elif pid == 0:
        multihost_utils.sync_global_devices("done")
    print(f"proc {pid} [{mode}]: ckpt OK")
""")


def _run_world(mode, tmp_path, n_procs):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    per_proc = 2 if n_procs == 2 else 4
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
        + [f"--xla_force_host_platform_device_count={per_proc}"])
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    out_dir = tmp_path / f"{mode}_{n_procs}p"
    out_dir.mkdir()
    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"
    pids = range(2) if n_procs == 2 else [-1]
    procs = [subprocess.Popen(
        [sys.executable, str(script), mode, coord, str(i), str(out_dir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in pids]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    losses = [float(o.split("loss=")[1].split()[0]) for o in outs]
    from unite_tpu.utils import checkpoint as ck

    payload = ck.load_checkpoint(
        str(out_dir / ("checkpoint-latest" + ck.CKPT_EXT)))
    return losses, payload


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fsdp", "tp"])
def test_two_process_layout_matches_single_process(mode, tmp_path):
    losses2, pay2 = _run_world(mode, tmp_path, n_procs=2)
    assert len(set(f"{l:.6f}" for l in losses2)) == 1  # same global loss
    losses1, pay1 = _run_world(mode, tmp_path, n_procs=1)
    np.testing.assert_allclose(losses2[0], losses1[0], rtol=1e-5)

    flat2 = {}

    def flatten(prefix, tree, out):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(prefix + (k,), v, out)
            else:
                out[prefix + (k,)] = np.asarray(v)

    flatten((), pay2["model"], flat2)
    flat1 = {}
    flatten((), pay1["model"], flat1)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(
            flat2[k], flat1[k], rtol=2e-6, atol=2e-7,
            err_msg=f"{mode}: {'/'.join(k)}")
