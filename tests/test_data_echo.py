"""Data echoing (--data_echo, arXiv:1907.05550): each device batch is
repeated k times so an input-bound host can feed the chip at line rate.

Properties pinned here:
- ``echo_batches`` expansion + the skip_echoes resume arithmetic are exact.
- A stage-1 run with echo does k x steps per epoch (schedules, step counter
  and checkpoints all in STEP units).
- Mid-epoch preemption at a step that is NOT an echo boundary resumes
  bitwise (host-batch skip = steps // k, then steps % k echoes of the first
  replayed batch are dropped) — the one accounting path unique to echoing.
"""

import numpy as np
import pytest

from unite_tpu.data.loader import echo_batches

from tests.test_entry_resume import _read_epoch_stats, _write_annotations  # noqa: F401
from tests.test_preemption import (
    _assert_tree_equal,
    _final_payload,
    _stage1_args,
)


def test_echo_batches_expansion_and_skip():
    items = [0, 1, 2, 3]
    k = 3
    full = [x for x in items for _ in range(k)]
    assert list(echo_batches(iter(items), k)) == full
    # skip_echoes drops leading echoes of the FIRST yielded batch only —
    # exactly what a resume consumed
    for skip in range(k):
        assert list(echo_batches(iter(items), k, skip_echoes=skip)) == \
            full[skip:], skip
    # k=1 passthrough
    assert list(echo_batches(iter(items), 1)) == items


def test_check_echo_resume_guard():
    """Mid-epoch resume under a DIFFERENT --data_echo must fail loudly
    (the epoch_step replay arithmetic is in echoed-step units); epoch-
    boundary checkpoints resume under any echo."""
    from unite_tpu.train.common import check_echo_resume

    mid = {"extra": {"epoch_step": 5}, "args": {"data_echo": 2}}
    check_echo_resume(mid, 2)  # matching echo: fine
    with pytest.raises(ValueError, match="data_echo"):
        check_echo_resume(mid, 1)
    # epoch boundary: echo-independent
    check_echo_resume({"extra": {"epoch_step": 0},
                       "args": {"data_echo": 2}}, 1)
    # legacy checkpoint without a recorded echo factor == echo 1
    with pytest.raises(ValueError, match="data_echo"):
        check_echo_resume({"extra": {"epoch_step": 3}, "args": {}}, 4)
    check_echo_resume(None, 4)


@pytest.mark.slow
def test_stage1_echo_steps_and_midecho_preemption_resume_bitwise(tmp_path):
    """32 source samples / host batch 8 = 4 host batches; echo 2 -> 8 steps
    per epoch. Preempt at step 5 of epoch 0 (mid-epoch AND mid-echo: 5 % 2
    = 1 residual echo), resume, and land bitwise on the uninterrupted final
    state — covers host-batch skip, residual-echo skip and the target-
    stream cycle fast-forward ((epoch*niter+skip) // k host batches)."""
    from unite_tpu.train.run_stage1 import main

    a = _stage1_args(tmp_path, tmp_path / "a", 2, n_source=32)
    a.data_echo = 2
    main(a)
    ref_payload = _final_payload(tmp_path / "a")
    ref = _read_epoch_stats(str(tmp_path / "a"))
    assert set(ref) == {0, 1}
    # step counter runs in echoed-step units: 2 epochs x 4 host batches x 2
    assert ref_payload["extra"]["step"] == 16

    b = _stage1_args(tmp_path, tmp_path / "b", 2, n_source=32)
    b.data_echo = 2
    b.stop_after_steps = 5
    main(b)
    mid = _final_payload(tmp_path / "b")
    assert mid["epoch"] == 0 and mid["extra"]["epoch_step"] == 5

    b = _stage1_args(tmp_path, tmp_path / "b", 2, n_source=32)
    b.data_echo = 2
    main(b)  # auto-resumes from the mid-epoch checkpoint
    got = _read_epoch_stats(str(tmp_path / "b"))
    assert got[1] == ref[1]
    payload = _final_payload(tmp_path / "b")
    _assert_tree_equal(ref_payload["model"], payload["model"], "model")
    _assert_tree_equal(ref_payload["optimizer"], payload["optimizer"],
                       "optimizer")
    assert payload["extra"]["step"] == ref_payload["extra"]["step"]
