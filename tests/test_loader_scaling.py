"""Loader worker-pool scaling (VERDICT r4 item 7).

The production input-path claim ("~85 clips/s x cores") was an
extrapolation from a 1-core host. These tests convert the pool's
parallelism from a projection into a tested property:

* sleep-bound items (decode-wait analogue — releases the GIL and the
  core) must scale with workers in BOTH modes even on a 1-core host:
  this pins the pool's concurrency STRUCTURE (items genuinely in flight
  simultaneously, no hidden serialization in the dispatch/collate path);
* cpu-bound items must scale with workers in process mode on a
  multi-core host (skipped on 1 core, runs wherever the suite gets a
  real machine — the honest version of the "x cores" claim).
"""

import os
import time

import pytest

from unite_tpu.data.loader import DataLoader


class SleepItems:
    """20ms 'decode' per item — IO/syscall-wait analogue."""

    def __len__(self):
        return 64

    def __getitem__(self, i):
        time.sleep(0.02)
        return i


class BusyItems:
    """~4ms of pure-python CPU per item."""

    def __len__(self):
        return 64

    def __getitem__(self, i):
        x = 0
        for k in range(40000):
            x += k * k
        return x


def _rate(ds, workers, mode, n_items=48):
    loader = DataLoader(ds, batch_size=4, num_workers=workers,
                        worker_mode=mode, shuffle=False, drop_last=False)
    it = iter(loader)
    next(it)  # pool spin-up outside the timed window
    t0 = time.perf_counter()
    got = 4
    for b in it:
        got += len(b)
        if got >= n_items:
            break
    return got / (time.perf_counter() - t0)


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_pool_concurrency_sleep_bound(mode):
    r1 = _rate(SleepItems(), 1, mode)
    r4 = _rate(SleepItems(), 4, mode)
    # 4 sleep-bound workers must overlap their waits: >= 2.5x of serial
    # (ideal 4x; generous margin for pool dispatch + 1-core scheduling)
    assert r4 > 2.5 * r1, (mode, r1, r4)


@pytest.mark.skipif(len(os.sched_getaffinity(0)) < 4,
                    reason="cpu-bound scaling needs >= 4 cores "
                           "(1-core CI host: sleep-bound test above pins "
                           "the concurrency structure instead)")
def test_pool_scaling_cpu_bound_process_mode():
    r1 = _rate(BusyItems(), 1, "process")
    r2 = _rate(BusyItems(), 2, "process")
    r4 = _rate(BusyItems(), 4, "process")
    assert r2 > 1.5 * r1, (r1, r2)
    assert r4 > 1.5 * r2, (r2, r4)
