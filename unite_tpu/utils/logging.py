"""Host-side observability sinks.

Counterpart of the reference's three sinks (SURVEY §5): stdout MetricLogger
(utils/metrics.py), TensorBoard (this module — reference utils.py:426-447
TensorboardLogger with explicit step management), and the ``log.txt`` jsonl
(config.log_stats). wandb is intentionally not wired (zero-egress
environment); the ``--disable_wandb`` flag is accepted for config compat.
"""

from __future__ import annotations

from typing import Optional


class TensorboardLogger:
    """Explicit-step scalar writer (utils.py:426-447 API parity)."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(logdir=log_dir)
        self.step = 0

    def set_step(self, step: Optional[int] = None):
        if step is not None:
            self.step = step
        else:
            self.step += 1

    def update(self, head: str = "scalar", step: Optional[int] = None, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.writer.add_scalar(
                f"{head}/{k}", float(v), self.step if step is None else step
            )

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


def maybe_tensorboard(args) -> Optional[TensorboardLogger]:
    log_dir = getattr(args, "log_dir", None)
    if not log_dir:
        return None
    try:
        return TensorboardLogger(log_dir)
    except ImportError:  # pragma: no cover
        print("tensorboardX unavailable; TensorBoard logging disabled")
        return None
