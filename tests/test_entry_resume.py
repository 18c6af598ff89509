"""Entry-level full-state resume tests.

The reference restores {model, optimizer, epoch, scaler, ema} on resume
(/root/reference/src/utils.py:689-776). These tests drive the ACTUAL stage
entry points (run_stage1/run_stage2 main) with tiny models on synthetic
data: train N epochs straight vs. train, die after epoch 0, resume — the
per-epoch loss sequences must match bitwise. This works because (a) the
checkpoint carries opt_state + step + EMA, (b) the train-step PRNG is
``fold_in(rng, state.step)``, and (c) the host data pipeline draws from
per-(seed, epoch, index) Generators.
"""

import json
import os

import jax

import numpy as np
import pytest

from unite_tpu.models.adaptation import AdaptationVisionTransformer
from unite_tpu.models.clip import CLIPVisionTransformer
from unite_tpu.models.vit import VisionTransformer
from unite_tpu.utils.registry import _MODEL_REGISTRY, register_model

# --- tiny test models (registered once) -------------------------------------

if "vit_test_tiny" not in _MODEL_REGISTRY:

    @register_model
    def vit_test_tiny(**kwargs):
        return VisionTransformer(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=2, qkv_bias=True, norm_eps=1e-6, **kwargs)

    @register_model
    def adaptation_test_tiny(**kwargs):
        cfg = dict(
            img_size=32, patch_size=8, encoder_embed_dim=32, encoder_depth=2,
            encoder_num_heads=2, clip_decoder_embed_dim=32, clip_output_dim=16,
        )
        allowed = AdaptationVisionTransformer.__dataclass_fields__
        for k, v in kwargs.items():
            if k in allowed and k not in cfg:
                cfg[k] = v
        return AdaptationVisionTransformer(**cfg)

    @register_model
    def clip_test_tiny(**kwargs):
        return CLIPVisionTransformer(
            input_resolution=kwargs.get("input_resolution", 32), patch_size=8,
            width=32, layers=2, heads=2, output_dim=16,
            return_attn=kwargs.get("return_attn", True),
            return_index=kwargs.get("return_index", (0, 1)))


def _write_annotations(tmp_path, name, n, n_classes=3):
    p = tmp_path / name
    lines = [f"video_{i:03d}.mp4,{i % n_classes}" for i in range(n)]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _read_epoch_stats(output_dir):
    stats = {}
    with open(os.path.join(output_dir, "log.txt")) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                stats[rec["epoch"]] = rec["train_loss"]
    return stats


def _stage2_args(tmp_path, output_dir, epochs):
    from unite_tpu.config import parse_with_config
    from unite_tpu.train.args import stage2_parser

    anno = _write_annotations(tmp_path, "train.csv", 16)
    args = parse_with_config(stage2_parser(), [])
    args.model = "vit_test_tiny"
    args.nb_classes = 3
    # Kinetics_sparse: class count comes from args (the Daily-DA pattern) —
    # fixed-class names like UCF101 now raise on nb_classes mismatch,
    # matching the reference's build.py:254 assert
    args.data_set = "Kinetics_sparse"
    args.ann_file_train = anno
    args.ann_file_val = _write_annotations(tmp_path, "val.csv", 8)
    args.ann_file_test = _write_annotations(tmp_path, "test.csv", 2)
    args.synthetic_data = True
    args.input_size = 32
    args.short_side_size = 32
    args.num_frames = 2
    args.tubelet_size = 1
    args.batch_size = 1  # per-chip; x8 fake devices = host batch 8
    args.batch_size_val = 1
    args.epochs = epochs
    args.warmup_epochs = 1
    args.num_workers = 2
    args.log_freq = 2
    args.output_dir = str(output_dir)
    args.auto_resume = True
    args.overwrite = "allow"
    args.test_best = False
    args.test_num_segment = 1
    args.test_num_crop = 1
    args.model_ema = True
    args.model_ema_decay = 0.9
    args.seed = 3
    return args


def test_stage2_eval_mode_records_test_stats(tmp_path):
    """--eval runs ONLY the multi-view final_test + merge and records the
    merged accuracies to log.txt + the wandb sink, matching the reference's
    eval branch (run_stage2.py:685-700)."""
    from unite_tpu.train.run_stage2 import main

    args = _stage2_args(tmp_path, tmp_path / "ev", 1)
    args.eval = True
    args.disable_wandb = False
    main(args)
    rec = json.loads(open(tmp_path / "ev" / "log.txt").readline())
    assert "test_acc1" in rec and "test_acc5" in rec
    assert "test/acc1" in open(tmp_path / "ev" / "wandb.jsonl").read()


def test_stage2_wandb_epoch_surface(tmp_path):
    """A full 1-epoch stage-2 run mirrors the reference's wandb surface:
    per-epoch train/accuracy + train/epoch (run_stage2.py:770-775), val/*
    incl. ece (:786-790), final test/acc1-5 (:846-847), plus the per-step
    train/* stream."""
    from unite_tpu.train.run_stage2 import main

    args = _stage2_args(tmp_path, tmp_path / "wsf", 1)
    args.disable_wandb = False
    main(args)
    wtxt = open(tmp_path / "wsf" / "wandb.jsonl").read()
    for key in ("train/accuracy", "train/epoch", "val/acc1", "val/ece",
                "test/acc1", "train/loss",
                # schedule meters (run_stage2's engine logs lr/min_lr/wd per
                # window, engine_for_finetuning.py:143-151)
                "train/lr", "train/min_lr", "train/weight_decay"):
        assert key in wtxt, key


@pytest.mark.slow
def test_stage2_resume_bitwise(tmp_path):
    from unite_tpu.train import common
    from unite_tpu.train.run_stage2 import main

    # uninterrupted 3-epoch run
    main(_stage2_args(tmp_path, tmp_path / "a", 3))
    ref = _read_epoch_stats(str(tmp_path / "a"))
    assert set(ref) == {0, 1, 2}

    # interrupted run: die right after epoch 0's checkpoint is written
    orig = common.save_epoch_stats

    def dying_save(args, epoch, stats):
        orig(args, epoch, stats)
        if epoch == 0 and "train_loss" in stats:
            raise RuntimeError("simulated preemption")

    common.save_epoch_stats = dying_save
    try:
        with pytest.raises(RuntimeError, match="simulated preemption"):
            main(_stage2_args(tmp_path, tmp_path / "b", 3))
    finally:
        common.save_epoch_stats = orig

    # resume: epochs 1-2 replay exactly
    main(_stage2_args(tmp_path, tmp_path / "b", 3))
    got = _read_epoch_stats(str(tmp_path / "b"))
    assert set(got) == {0, 1, 2}
    for e in (0, 1, 2):
        assert got[e] == ref[e], f"epoch {e}: {got[e]} != {ref[e]}"


@pytest.mark.slow
def test_stage1_resume_bitwise(tmp_path):
    from unite_tpu.train import common
    from unite_tpu.train.args import stage1_parser
    from unite_tpu.train.run_stage1 import main

    def make_args(output_dir, epochs):
        from unite_tpu.config import parse_with_config

        args = parse_with_config(stage1_parser(), [])
        args.model = "adaptation_test_tiny"
        args.clip_teacher = "clip_test_tiny"
        args.clip_return_layers = [0, 1]
        args.clip_input_resolution = 32
        args.ann_file_train = _write_annotations(tmp_path, "s1.csv", 16)
        args.ann_file_train_target = ""
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

    a_args = make_args(tmp_path / "a", 3)
    a_args.disable_wandb = False
    main(a_args)
    ref = _read_epoch_stats(str(tmp_path / "a"))
    assert set(ref) == {0, 1, 2}
    # wandb surface: per-step train/* + per-epoch marker (run_stage1.py:901)
    wtxt = open(tmp_path / "a" / "wandb.jsonl").read()
    assert '"epoch"' in wtxt and "train/loss" in wtxt

    orig = common.save_epoch_stats

    def dying_save(args, epoch, stats):
        orig(args, epoch, stats)
        if epoch == 0 and "train_loss" in stats:
            raise RuntimeError("simulated preemption")

    common.save_epoch_stats = dying_save
    try:
        with pytest.raises(RuntimeError, match="simulated preemption"):
            main(make_args(tmp_path / "b", 3))
    finally:
        common.save_epoch_stats = orig

    main(make_args(tmp_path / "b", 3))
    got = _read_epoch_stats(str(tmp_path / "b"))
    for e in (0, 1, 2):
        assert got[e] == ref[e], f"epoch {e}: {got[e]} != {ref[e]}"


@pytest.mark.slow
def test_stage2_reset_train_dataset(tmp_path):
    """--reset_train_dataset remakes the loader each epoch and re-draws the
    train_fraction subset (ref run_stage2.py:440-453, 754)."""
    from unite_tpu.train.run_stage2 import main

    args = _stage2_args(tmp_path, tmp_path / "r", 2)
    args.reset_train_dataset = True
    args.train_fraction = 0.5
    main(args)
    got = _read_epoch_stats(str(tmp_path / "r"))
    assert set(got) == {0, 1}
    assert all(np.isfinite(v) for v in got.values())


@pytest.mark.slow
def test_stage2_reset_train_dataset_resume_bitwise(tmp_path):
    """reset_train_dataset × resume: the first RESUMED epoch must rebuild
    with the same epoch-salted seed an uninterrupted run used (guarding the
    rebuild on epoch > start_epoch trained the first resumed epoch on the
    base-seed subset — a different train_fraction draw)."""
    from unite_tpu.train import common
    from unite_tpu.train.run_stage2 import main

    def cfg(out, epochs):
        args = _stage2_args(tmp_path, out, epochs)
        args.reset_train_dataset = True
        args.train_fraction = 0.5
        return args

    main(cfg(tmp_path / "ra", 3))
    ref = _read_epoch_stats(str(tmp_path / "ra"))
    assert set(ref) == {0, 1, 2}

    orig = common.save_epoch_stats

    def dying_save(args, epoch, stats):
        orig(args, epoch, stats)
        if epoch == 0 and "train_loss" in stats:
            raise RuntimeError("simulated preemption")

    common.save_epoch_stats = dying_save
    try:
        with pytest.raises(RuntimeError, match="simulated preemption"):
            main(cfg(tmp_path / "rb", 3))
    finally:
        common.save_epoch_stats = orig

    main(cfg(tmp_path / "rb", 3))
    got = _read_epoch_stats(str(tmp_path / "rb"))
    for e in (0, 1, 2):
        assert got[e] == ref[e], f"epoch {e}: {got[e]} != {ref[e]}"


@pytest.mark.slow
def test_stage1_unused_blocks_survive_training(tmp_path):
    """clip_return_layers below depth-1: blocks above max(return_layers)
    must (a) EXIST in the stage-1 checkpoint — initializing the student
    with clip_only=True used to drop them from the param tree entirely,
    silently discarding their pretrained weights (ADVICE r4) — and (b)
    pass through training bitwise untouched (the reference leaves their
    .grad None, so torch AdamW neither steps nor decays them)."""
    from tests.test_preemption import _stage1_args
    from unite_tpu.train.run_stage1 import main
    from unite_tpu.utils import checkpoint as ck

    args = _stage1_args(tmp_path, tmp_path / "ub", 2, with_target=False)
    args.clip_return_layers = [0]  # depth 2 -> block 1 never runs
    args.weight_decay = 0.1       # decay would visibly move unfrozen params
    args.save_ckpt_freq = 1       # numbered ckpt at epoch 0 too
    main(args)
    p0 = ck.load_checkpoint(str(tmp_path / "ub" / "checkpoint-0.msgpack"))
    p1 = ck.load_checkpoint(
        str(tmp_path / "ub" / "checkpoint-latest.msgpack"))
    assert "blocks_1" in p0["model"]["encoder"], \
        sorted(p0["model"]["encoder"])
    b0 = p0["model"]["encoder"]["blocks_1"]
    b1 = p1["model"]["encoder"]["blocks_1"]
    flat0 = jax.tree_util.tree_leaves(b0)
    flat1 = jax.tree_util.tree_leaves(b1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the LIVE block must have moved (training actually happened)
    l0 = jax.tree_util.tree_leaves(p0["model"]["encoder"]["blocks_0"])
    l1 = jax.tree_util.tree_leaves(p1["model"]["encoder"]["blocks_0"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l0, l1))
