"""Per-step LR / weight-decay schedules.

Behavioral parity with the reference's schedule builders
(/root/reference/src/utils.py:646-686): values are precomputed per-step as
numpy arrays of length ``epochs * niter_per_ep``. In the TPU build the full
schedule array is also consumable on-device (``schedule[step]`` gathered
inside the jitted train step), so LR changes never force a recompile.
"""

from __future__ import annotations

import math

import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
) -> np.ndarray:
    """Linear warmup followed by cosine decay, one value per optimizer step.

    Matches /root/reference/src/utils.py:646-663 exactly (including the
    ``linspace`` warmup endpoints and the ``cos(pi * i / len(iters))`` decay).
    """
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    warmup_schedule = np.array([])
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    n_decay = epochs * niter_per_ep - warmup_iters
    iters = np.arange(n_decay)
    schedule = np.array(
        [
            final_value
            + 0.5 * (base_value - final_value) * (1 + math.cos(math.pi * i / n_decay))
            for i in iters
        ]
    )
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def step_scheduler(
    base_value: float,
    step_fraction=None,
    epochs: int = 0,
    niter_per_ep: int = 0,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
    steps=None,
) -> np.ndarray:
    """Warmup then constant, with optional multiplicative step drops.

    Matches /root/reference/src/utils.py:665-686: when ``steps`` is given the
    schedule is built over the *full* length and each step multiplies the
    tail from ``steps[i]*niter_per_ep`` onward by ``step_fraction[i]`` —
    warmup is then concatenated in front (reference semantics preserved).
    """
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    warmup_schedule = np.array([])
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    if steps is None:
        schedule = np.ones(epochs * niter_per_ep - warmup_iters) * base_value
    else:
        schedule = np.ones(epochs * niter_per_ep) * base_value
        for i in range(len(steps)):
            schedule[steps[i] * niter_per_ep :] *= step_fraction[i]

    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def scaled_lr(base_lr: float, total_batch_size: int, num_sample: int = 1) -> float:
    """Linear LR scaling rule: ``lr * B_total * num_sample / 256``.

    Matches /root/reference/run_stage1.py:796-800.
    """
    return base_lr * total_batch_size * num_sample / 256.0
