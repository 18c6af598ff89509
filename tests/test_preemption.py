"""Preemption-safe checkpointing and stream fast-forward.

Three properties:
- ``DataLoader.skip_next_batches`` / ``cycle(loader, skip_batches=n)`` are
  exact index-level fast-forwards (no data decoded for skipped batches).
- The cycled TARGET stream of stages 1/3 resumes where an uninterrupted run
  would be (the reference sidesteps this by re-creating its target iterator
  every epoch with a never-advanced sampler epoch, run_stage1.py:313-321;
  our persistent cycle must be fast-forwarded on resume instead).
- Mid-epoch preemption (SIGTERM / --stop_after_steps) writes an
  ``epoch_step`` checkpoint and the resumed run replays the remainder of
  the epoch bitwise — a capability the reference does not have (SURVEY §5:
  no preemption handling; it loses the partial epoch).
"""

import json
import os

import numpy as np
import pytest

from unite_tpu.data.loader import DataLoader, cycle

# registers the tiny test models (vit_test_tiny etc.) as an import side
# effect; also provides the annotation/log helpers
from tests.test_entry_resume import (  # noqa: F401
    _read_epoch_stats,
    _stage2_args,
    _write_annotations,
)


# --- loader-level fast-forward -----------------------------------------------

def _index_loader(n=20, bs=4, **kw):
    return DataLoader(list(range(n)), batch_size=bs, num_workers=1, **kw)


def test_skip_next_batches_is_exact_and_consumed_once():
    loader = _index_loader()
    full = [list(b) for b in loader]
    loader.skip_next_batches(2)
    skipped = [list(b) for b in loader]
    assert skipped == full[2:]
    # consumed once: the next iteration is full again
    assert [list(b) for b in loader] == full


def test_cycle_skip_matches_consumed_stream():
    def fresh():
        return _index_loader(n=12, bs=4, shuffle=True, seed=9)

    ref = cycle(fresh())
    consumed = [list(next(ref)) for _ in range(17)]  # crosses 5 epoch wraps
    for skip in (1, 3, 6, 11):  # within-epoch, boundary, and wrapped skips
        ff = cycle(fresh(), skip_batches=skip)
        got = [list(next(ff)) for _ in range(4)]
        assert got == consumed[skip:skip + 4], f"skip={skip}"


# --- stage-1 entry: target-stream resume (the cycle fast-forward fix) --------

def _stage1_args(tmp_path, output_dir, epochs, with_target=True,
                 n_source=16):
    from unite_tpu.config import parse_with_config
    from unite_tpu.train.args import stage1_parser

    args = parse_with_config(stage1_parser(), [])
    args.model = "adaptation_test_tiny"
    args.clip_teacher = "clip_test_tiny"
    args.clip_return_layers = [0, 1]
    args.clip_input_resolution = 32
    args.ann_file_train = _write_annotations(tmp_path, "s1.csv", n_source)
    args.ann_file_train_target = (
        _write_annotations(tmp_path, "s1t.csv", 8) if with_target else "")
    args.synthetic_data = True
    args.input_size = 32
    args.patch_size = 8
    args.num_frames = 2
    args.num_segments = 2
    args.tubelet_size = 1
    args.mask_ratio = 0.5
    args.batch_size = 1  # per-chip; x8 fake devices = host batch 8
    args.epochs = epochs
    args.warmup_epochs = 1
    args.num_workers = 2
    args.log_freq = 1
    args.output_dir = str(output_dir)
    args.auto_resume = True
    args.overwrite = "allow"
    args.seed = 5
    return args


@pytest.mark.slow
def test_stage1_target_stream_resume_bitwise(tmp_path):
    """Resume with a TARGET stream: the persistent cycle() must fast-forward
    past the batches previous epochs consumed, else the resumed epochs see
    different target clips than an uninterrupted run (regression test for
    the un-fast-forwarded cycle)."""
    from unite_tpu.train import common
    from unite_tpu.train.run_stage1 import main

    main(_stage1_args(tmp_path, tmp_path / "a", 3))
    ref = _read_epoch_stats(str(tmp_path / "a"))
    assert set(ref) == {0, 1, 2}

    orig = common.save_epoch_stats

    def dying_save(args, epoch, stats):
        orig(args, epoch, stats)
        if epoch == 0 and "train_loss" in stats:
            raise RuntimeError("simulated crash")

    common.save_epoch_stats = dying_save
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            main(_stage1_args(tmp_path, tmp_path / "b", 3))
    finally:
        common.save_epoch_stats = orig

    main(_stage1_args(tmp_path, tmp_path / "b", 3))
    got = _read_epoch_stats(str(tmp_path / "b"))
    for e in (0, 1, 2):
        assert got[e] == ref[e], f"epoch {e}: {got[e]} != {ref[e]}"


# --- mid-epoch preemption ----------------------------------------------------

def _final_payload(output_dir):
    from unite_tpu.utils import checkpoint as ck

    return ck.load_checkpoint(
        os.path.join(str(output_dir), "checkpoint-latest.msgpack"))


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b, err_msg=path)
    else:
        assert a == b, (path, a, b)


@pytest.mark.slow
def test_stage2_midepoch_preemption_resume_bitwise(tmp_path):
    """Preempt stage-2 mid-epoch (--stop_after_steps), resume, and land on
    the EXACT final state an uninterrupted run produces (params, optimizer
    moments, EMA). 16 samples / host batch 8 = 2 batches per epoch;
    stopping after 3 steps preempts in the middle of epoch 1."""
    from unite_tpu.train.run_stage2 import main

    main(_stage2_args(tmp_path, tmp_path / "a", 3))
    ref = _read_epoch_stats(str(tmp_path / "a"))
    ref_payload = _final_payload(tmp_path / "a")

    args = _stage2_args(tmp_path, tmp_path / "b", 3)
    args.stop_after_steps = 3
    main(args)
    mid = _final_payload(tmp_path / "b")
    assert mid["extra"]["epoch_step"] == 1 and mid["epoch"] == 1

    args = _stage2_args(tmp_path, tmp_path / "b", 3)
    main(args)  # auto-resumes from the mid-epoch checkpoint

    got = _read_epoch_stats(str(tmp_path / "b"))
    # epoch 1's logged loss averages only the replayed steps; epochs 0 and 2
    # must match bitwise, and so must the complete final state
    assert got[0] == ref[0] and got[2] == ref[2], (got, ref)
    payload = _final_payload(tmp_path / "b")
    for key in ("model", "optimizer", "model_ema"):
        if key in ref_payload:
            _assert_tree_equal(ref_payload[key], payload[key], key)
    assert payload["epoch"] == ref_payload["epoch"]
    assert payload["extra"]["step"] == ref_payload["extra"]["step"]
    assert "epoch_step" not in payload["extra"]


@pytest.mark.slow
def test_stage1_midepoch_preemption_with_target(tmp_path):
    """Mid-epoch preemption in stage 1 WITH a target stream: the resumed run
    must skip the consumed source batches AND fast-forward the cycled target
    stream by epoch*niter + epoch_step batches. 32 samples / host batch 8 =
    4 steps per epoch; stop after 6 → mid-epoch 1 at step 2."""
    from unite_tpu.train.run_stage1 import main

    main(_stage1_args(tmp_path, tmp_path / "a", 2, n_source=32))
    ref_payload = _final_payload(tmp_path / "a")
    ref = _read_epoch_stats(str(tmp_path / "a"))

    args = _stage1_args(tmp_path, tmp_path / "b", 2, n_source=32)
    args.stop_after_steps = 6
    main(args)
    mid = _final_payload(tmp_path / "b")
    assert mid["extra"]["epoch_step"] == 2 and mid["epoch"] == 1

    main(_stage1_args(tmp_path, tmp_path / "b", 2, n_source=32))
    got = _read_epoch_stats(str(tmp_path / "b"))
    assert got[0] == ref[0]
    payload = _final_payload(tmp_path / "b")
    _assert_tree_equal(ref_payload["model"], payload["model"], "model")
    _assert_tree_equal(ref_payload["optimizer"], payload["optimizer"],
                       "optimizer")
    assert payload["extra"]["step"] == ref_payload["extra"]["step"]
