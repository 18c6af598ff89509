"""AsyncCheckpointer: background full-state saves.

The entries checkpoint through ``AsyncCheckpointer`` (run_stage{1,2,3}.py)
so the next epoch overlaps the D2H + serialize + write. These tests pin the
properties that make that safe: byte-identical artifacts vs the sync path,
immunity to buffer donation of the live state after the snapshot, fail-fast
error propagation at the next wait()/save(), and a non-daemon writer (an
entry dying on an exception still lands the in-flight write at exit).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import unite_tpu.utils.checkpoint as ck
from unite_tpu.optim.factory import create_optimizer
from unite_tpu.train.train_state import TrainState


def _state(seed=0):
    params = {"w": jnp.asarray(np.random.default_rng(seed).normal(
        size=(8, 8)), jnp.float32)}
    tx, _ = create_optimizer("adamw", lr=1e-3, params=params)
    return TrainState.create(params, tx)


def test_async_save_matches_sync_bytes(tmp_path):
    state = _state()
    ck.save_train_state(str(tmp_path / "sync"), 3, state,
                        args={"a": 1}, tags=("latest", 3))
    io = ck.AsyncCheckpointer()
    io.save_train_state(str(tmp_path / "async"), 3, state,
                        args={"a": 1}, tags=("latest", 3))
    io.wait()
    for tag in ("latest", "3"):
        a = (tmp_path / "sync" / f"checkpoint-{tag}.msgpack").read_bytes()
        b = (tmp_path / "async" / f"checkpoint-{tag}.msgpack").read_bytes()
        assert a == b


def test_snapshot_survives_donation_of_live_state(tmp_path):
    state = _state(1)
    want = np.asarray(state.params["w"])

    io = ck.AsyncCheckpointer()
    io.save_train_state(str(tmp_path), 0, state)
    # donate and overwrite the live buffers immediately, as a donating
    # train step does the moment save() returns
    bump = jax.jit(lambda t: jax.tree.map(lambda x: x + 1.0, t),
                   donate_argnums=(0,))
    _ = bump(state.params)
    io.wait()

    payload = ck.load_checkpoint(str(tmp_path / "checkpoint-latest.msgpack"))
    np.testing.assert_array_equal(payload["model"]["w"], want)


def test_save_failure_raises_at_next_wait(tmp_path):
    target = tmp_path / "not_a_dir"
    target.write_text("occupied")  # makedirs will fail on a file
    io = ck.AsyncCheckpointer()
    io.save_train_state(str(target), 0, _state(2))
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        io.wait()
    # the error is cleared after being raised; the writer stays usable
    io.save_train_state(str(tmp_path / "ok"), 0, _state(2))
    io.wait()
    assert (tmp_path / "ok" / "checkpoint-latest.msgpack").exists()


def test_second_save_joins_first(tmp_path):
    io = ck.AsyncCheckpointer()
    for epoch in range(3):
        io.save_train_state(str(tmp_path), epoch, _state(epoch),
                            tags=("latest", epoch))
    io.wait()
    for tag in ("latest", "0", "1", "2"):
        assert (tmp_path / f"checkpoint-{tag}.msgpack").exists()
    payload = ck.load_checkpoint(str(tmp_path / "checkpoint-latest.msgpack"))
    assert payload["epoch"] == 2


def test_writer_thread_is_non_daemon(tmp_path):
    # A daemon writer would be killed mid-write when an entry dies on an
    # unhandled exception (NaN fail-fast), silently losing the newest
    # epoch's checkpoint; non-daemon means the interpreter joins it.
    io = ck.AsyncCheckpointer()
    io.save_train_state(str(tmp_path), 0, _state())
    assert io._thread is not None and not io._thread.daemon
    io.wait()


def test_restore_roundtrip_through_async(tmp_path):
    state = _state(3)
    io = ck.AsyncCheckpointer()
    io.save_train_state(str(tmp_path), 5, state, tags=("latest",))
    io.wait()
    payload = ck.auto_load_model(str(tmp_path))
    fresh = ck.restore_train_state(_state(99), payload)
    np.testing.assert_array_equal(np.asarray(fresh.params["w"]),
                                  np.asarray(state.params["w"]))
    assert int(fresh.step) == int(state.step)
