"""Main-vs-main: the reference's run_stage2.main() vs ours on identical
synthetic batches (tools/main_parity.py; VERDICT r4 item 2).

Covers the entry GLUE the engine-parity tests cannot see: schedule
construction + the per-step LR/WD writes (reference run_stage2.py:651-675,
604 — notably stage 2 does NOT apply the lr*batch/256 scaling rule, which
this harness caught), EMA/update_freq ordering inside a real epoch loop,
val/best-checkpoint/final-test/merge cadence, and (in the tool's
--resume_check mode, run per round) the auto-resume glue
(utils.py:739-776). Expected agreement: ~1e-7 relative (fp32, identical
batches; recorded 3.7e-8 fresh / 7.5e-8 resumed on 2026-08-20)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_stage2_main_vs_main(tmp_path):
    out = tmp_path / "parity.json"
    # subprocess: conftest doesn't apply — force CPU and drop the suite's
    # 8-fake-device XLA_FLAGS (the comparison is single-"chip", like the
    # reference's single process; 8 devices would make host batch 32)
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="")
    proc = subprocess.run(
        [sys.executable, "tools/main_parity.py", "--epochs", "1",
         "--json", str(out)],
        capture_output=True, text=True, timeout=1500, cwd="/root/repo",
        env=env)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PARITY OK" in proc.stdout
