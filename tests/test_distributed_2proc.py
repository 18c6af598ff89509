"""Real 2-process jax.distributed integration (CPU backend).

Unlike tests/test_multihost.py's monkeypatched world, this spawns two
actual processes that rendezvous through ``jax.distributed.initialize``,
build one global 2-device mesh, feed DISTINCT per-process batches through
``shard_batch`` (exercising the multi-host
``make_array_from_process_local_data`` path), run a psum-reduced step via
``data_parallel_jit``, and cross-check ``process_allgather`` — the
counterpart of the reference's torchrun+NCCL world
(/root/reference/src/utils.py:510-551, stage launchers)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert len(jax.local_devices()) == 1

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from unite_tpu.parallel.mesh import data_parallel_jit, make_mesh, \\
        replicate, shard_batch

    mesh = make_mesh()
    # distinct per-process data: global batch = [0..3] rows on p0, [4..7] p1
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + pid * 12.0
    batch = shard_batch({"x": local}, mesh)
    assert batch["x"].shape == (8, 3), batch["x"].shape  # global shape

    params = replicate({"w": jnp.ones((3,), jnp.float32)}, mesh)

    def step(params, batch):
        # per-shard mean -> psum-mean emitted by GSPMD: the global mean
        loss = jnp.mean(batch["x"] @ params["w"])
        return params, {"loss": loss}

    step_p = data_parallel_jit(step, mesh, state_argnums=(0,),
                               batch_argnums=(1,))
    _, metrics = step_p(params, batch)
    loss = float(metrics["loss"])
    want = float(np.arange(24, dtype=np.float32).reshape(8, 3).sum(1).mean())
    assert abs(loss - want) < 1e-4, (loss, want)

    gathered = multihost_utils.process_allgather(np.array([pid, loss]))
    assert gathered.shape == (2, 2), gathered.shape
    assert gathered[0, 0] == 0.0 and gathered[1, 0] == 1.0
    print(f"proc {pid}: loss={loss:.4f} OK")

    # --- run_validation over the real 2-process mesh: regression for the
    # sharded-probs fetch (must go through _local_host_array; np.asarray on
    # the non-fully-addressable step output used to raise) and for the
    # cross-host loss/acc aggregation.
    from unite_tpu.train.common import run_validation

    nb = 4

    def eval_step(state, batch):
        logits = batch["videos"].reshape(batch["videos"].shape[0], -1)[:, :nb]
        return {"probs": jax.nn.softmax(logits, axis=-1)}

    eval_p = data_parallel_jit(eval_step, mesh, state_argnums=(0,),
                               batch_argnums=(1,), donate_state=False)
    rng = np.random.default_rng(7)
    clips_a = (rng.normal(size=(2, nb)).astype(np.float32) + pid)
    clips_b = (rng.normal(size=(1, nb)).astype(np.float32) - pid)  # short batch -> pad path
    loader = [
        (clips_a, np.array([pid * 2, pid * 2 + 1], np.int64) % nb),
        (clips_b, np.array([pid], np.int64) % nb),
    ]
    stats = run_validation(params, eval_p, loader, mesh, batch_size=2)
    assert 0.0 <= stats["acc1"] <= 100.0, stats
    g = multihost_utils.process_allgather(
        np.array([stats["acc1"], stats["loss"]]))
    assert np.allclose(g[0], g[1]), g  # stats are global, identical on both
    print(f"proc {pid}: val acc1={stats['acc1']:.2f} OK")

    # --- sharded-state checkpoint save (multihost --zero1/--tp analogue):
    # params sharded ACROSS the two processes are neither fully addressable
    # nor fully replicated — the save must gather them collectively before
    # the proc-0 fetch (a proc-0-only snapshot used to raise, killing every
    # epoch-end checkpoint of a multihost zero1 run).
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from unite_tpu.train.train_state import TrainState
    from unite_tpu.utils import checkpoint as ck

    sh = NamedSharding(mesh, P("data"))
    local_w = np.arange(4, dtype=np.float32) + pid * 4.0  # global [0..8)
    w = jax.make_array_from_process_local_data(sh, local_w)
    assert not w.is_fully_addressable and not w.is_fully_replicated
    st = TrainState.create({"w": w}, optax.sgd(0.1))
    out_dir = sys.argv[3]
    io = ck.AsyncCheckpointer()
    io.save_train_state(out_dir, 0, st, extra={"best_acc": 12.5},
                        tags=("latest",))
    io.wait()
    if pid == 0:
        payload = ck.load_checkpoint(
            os.path.join(out_dir, "checkpoint-latest" + ck.CKPT_EXT))
        got = np.asarray(payload["model"]["w"])
        assert np.allclose(got, np.arange(8, dtype=np.float32)), got
        assert float(payload["extra"]["best_acc"]) == 12.5
    multihost_utils.sync_global_devices("ckpt_done")
    print(f"proc {pid}: sharded ckpt OK")
""")


def test_two_process_distributed_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process: drop the 8-fake-device flag the parent
    # test env forces
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(ckpt_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: loss=" in out
        assert f"proc {i}: val acc1=" in out
        assert f"proc {i}: sharded ckpt OK" in out
    # both processes computed the identical global loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1
    np.testing.assert_allclose(float(l0.rstrip("OK")), 34.5, atol=1e-3)
