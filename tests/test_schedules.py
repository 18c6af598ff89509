"""Golden-value tests for per-step LR/WD schedules.

The expected values are computed inline from the published formulas
(linear warmup + half-cosine decay), independently of the implementation.
"""

import math

import numpy as np
import pytest

from unite_tpu.utils.schedules import cosine_scheduler, scaled_lr, step_scheduler


def test_cosine_length_and_endpoints():
    sched = cosine_scheduler(1.5e-4, 1e-6, epochs=10, niter_per_ep=7, warmup_epochs=2)
    assert len(sched) == 70
    assert sched[0] == 0.0  # start_warmup_value default
    # warmup ends at base value
    assert sched[13] == pytest.approx(1.5e-4)
    # cosine tail approaches final value
    assert sched[-1] == pytest.approx(
        1e-6 + 0.5 * (1.5e-4 - 1e-6) * (1 + math.cos(math.pi * 55 / 56))
    )


def test_cosine_no_warmup():
    sched = cosine_scheduler(1.0, 0.0, epochs=1, niter_per_ep=4)
    expect = [0.5 * (1 + math.cos(math.pi * i / 4)) for i in range(4)]
    np.testing.assert_allclose(sched, expect, rtol=1e-12)


def test_cosine_warmup_steps_override():
    sched = cosine_scheduler(
        1.0, 0.0, epochs=1, niter_per_ep=10, warmup_epochs=1, warmup_steps=3
    )
    assert len(sched) == 10
    np.testing.assert_allclose(sched[:3], np.linspace(0, 1.0, 3))


def test_step_scheduler_constant():
    sched = step_scheduler(2.5e-5, epochs=5, niter_per_ep=3, warmup_epochs=1)
    assert len(sched) == 15
    np.testing.assert_allclose(sched[3:], 2.5e-5)


def test_step_scheduler_drops():
    sched = step_scheduler(
        1.0, step_fraction=[0.1, 0.5], epochs=4, niter_per_ep=2,
        warmup_epochs=0, steps=[1, 3],
    )
    # base over full length; tail from step*niter multiplied
    np.testing.assert_allclose(sched, [1, 1, 0.1, 0.1, 0.1, 0.1, 0.05, 0.05])


def test_scaled_lr():
    # lr * total_batch * num_sample / 256 (run_stage1.py:796-800)
    assert scaled_lr(1.5e-4, 256) == pytest.approx(1.5e-4)
    assert scaled_lr(1.5e-4, 64 * 4, 2) == pytest.approx(3e-4)


def test_warmup_steps_without_warmup_epochs():
    """--warmup_steps with warmup_epochs=0 must produce a real warmup ramp
    (the reference's guard on warmup_epochs builds an empty warmup and
    trips the length assert — latent defect, fixed here; ADVICE r4)."""
    from unite_tpu.utils.schedules import cosine_scheduler, step_scheduler

    s = cosine_scheduler(1.0, 0.1, epochs=4, niter_per_ep=50,
                         warmup_epochs=0, start_warmup_value=0.0,
                         warmup_steps=30)
    assert len(s) == 200
    assert s[0] == 0.0 and abs(s[29] - 1.0) < 1e-12  # linspace endpoints
    assert s[30] <= 1.0 and s[-1] >= 0.1 - 1e-12

    t = step_scheduler(1.0, 0.1, epochs=4, niter_per_ep=50,
                       warmup_epochs=0, warmup_steps=30, steps=[2])
    assert len(t) == 200 and t[0] == 0.0 and t[-1] == 0.1
