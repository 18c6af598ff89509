"""Entry-level multi-chip semantics on an 8-fake-device CPU mesh.

``batch_size`` args are PER-CHIP (the reference's per-GPU semantics —
its LR linear-scaling rule multiplies by world size, run_stage1.py:796-800,
which `common.lr_tables` mirrors with world = jax.device_count()). Each
process's loader must therefore yield batch_size x local_device_count rows
(`common.per_host_batch`); before that fix the entries fed batch_size rows
to an 8-device shard_batch, which is a divisibility crash at batch_size < 8
and an 8x-too-small global batch (with 8x-too-large scaled LR) otherwise.

Runs in a subprocess: the fake-device count must be set before jax
initializes its backends.
"""

import os
import subprocess
import sys
import textwrap

import pytest

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

    assert jax.device_count() == 8, jax.device_count()
    assert common.per_host_batch(1) == 8

    args = _stage2_args(tmp, tmp / "out", 1)
    args.batch_size = 1        # per-chip -> loader yields 8 rows/step
    args.batch_size_val = 1
    main(args)

    import json
    with open(tmp / "out" / "log.txt") as f:
        rec = json.loads(f.readline())
    assert "train_loss" in rec and rec["train_loss"] == rec["train_loss"]
    print("MULTICHIP_ENTRY_OK")
""")


@pytest.mark.slow
def test_stage2_entry_on_8_fake_devices(tmp_path):
    env = dict(os.environ)
    env["CHILD_TMP"] = str(tmp_path)
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = f"/root/repo:{env['PYTHONPATH']}"
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTICHIP_ENTRY_OK" in out.stdout
