"""Real-SIGTERM preemption: the actual signal-handler path.

tests/test_preemption.py exercises the preemption machinery through the
``--stop_after_steps`` fault-injection knob; this test delivers a REAL
SIGTERM to a running stage-2 entry in a subprocess (the signal GCE/TPU-pod
maintenance sends before reclaiming a VM) and asserts the entry finishes
the in-flight step, writes a resumable checkpoint, and exits cleanly —
the wiring ``PreemptionGuard._on_signal`` -> epoch-loop checkpoint that
injection alone cannot cover. The reference has no preemption handling at
all (SURVEY §5: auto-resume from epoch boundaries is its only recovery).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.argv = ["child"]
    import pathlib
    tmp = pathlib.Path(os.environ["CHILD_TMP"])

    from tests.test_entry_resume import _stage2_args  # registers tiny models
    from tests.test_entry_resume import _write_annotations
    from unite_tpu.train.run_stage2 import main

    args = _stage2_args(tmp, tmp / "out", 50)   # far more epochs than the
    args.ann_file_train = _write_annotations(   # signal allows to finish
        tmp, "sig.csv", 64)
    args.batch_size = 8  # single fake device here: host batch 8, 8 st/ep
    args.batch_size_val = 8
    args.disable_eval_during_finetuning = True
    print("CHILD_TRAINING_STARTED", flush=True)
    main(args)
""")


@pytest.mark.slow
def test_stage2_sigterm_writes_resumable_checkpoint(tmp_path):
    env = dict(os.environ)
    env["CHILD_TMP"] = str(tmp_path)
    env["PYTHONUNBUFFERED"] = "1"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    # drop conftest's 8-fake-device force: this test needs 1 device so
    # per_host_batch(8)=8 and the 64-sample dataset gives 8 steps/epoch —
    # otherwise the host batch is 64, every epoch is ONE step, and the
    # mid-epoch path this test exists to cover can never trigger
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD], env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for the train loop to actually be running (first step log line),
    # then deliver the real signal
    lines = []
    deadline = time.time() + 420
    for line in proc.stdout:
        lines.append(line)
        if "Epoch [0]" in line or time.time() > deadline:
            break
    assert any("Epoch [0]" in l for l in lines), "".join(lines)[-2000:]
    proc.send_signal(signal.SIGTERM)
    try:
        rest, _ = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    out = "".join(lines) + rest
    assert proc.returncode == 0, out[-3000:]
    assert "PreemptionGuard: caught signal" in out, out[-3000:]
    assert "Preempted" in out, out[-3000:]

    # the checkpoint it wrote must be loadable and resumable
    from unite_tpu.utils import checkpoint as ck
    from unite_tpu.train.common import resume_position

    payload = ck.auto_load_model(str(tmp_path / "out"))
    assert payload is not None
    start_epoch, skip = resume_position(payload)
    # preempted long before epoch 50: resume points inside the run, and —
    # since the signal lands within the first 8-step epochs — mid-epoch,
    # exercising the epoch_step checkpoint path
    assert start_epoch < 50
    assert "Preempted at epoch" in out, out[-3000:]  # mid-epoch variant
    assert payload["extra"]["epoch_step"] == skip > 0
