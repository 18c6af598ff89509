"""Reference CLI/behavior parity: flags, schedules, repetitions, remat.

Guards the round-3 parity sweep: every ``--flag`` the reference parsers
define must be accepted by ours (run_stage1.py:53-250, run_stage2.py:54-304,
run_stage3.py:62-289), and the flags that carry behavior — lr_schedule
families, source-stream repetitions, use_checkpoint/checkpoint_num remat,
umt_step, checkpoints_enabled — must do what the reference's do.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.train.args import stage1_parser, stage2_parser, stage3_parser

REF = "/root/reference"


def _ref_flags(path):
    with open(path) as f:
        return set(re.findall(r"add_argument\(\s*['\"]--([A-Za-z0-9_]+)",
                              f.read()))


def _our_flags(parser):
    return {opt[2:] for a in parser._actions for opt in a.option_strings
            if opt.startswith("--")}


@pytest.mark.parametrize("stage,mk", [
    (1, stage1_parser), (2, stage2_parser), (3, stage3_parser)])
def test_cli_surface_superset_of_reference(stage, mk):
    ref = _ref_flags(f"{REF}/run_stage{stage}.py")
    missing = ref - _our_flags(mk())
    assert not missing, f"stage{stage} flags absent: {sorted(missing)}"


def test_reference_style_complement_flags():
    args = stage1_parser().parse_args(
        ["--checkpoints_disabled", "--use_mean_pooling", "--no_pin_mem"])
    assert args.checkpoints_enabled is False
    assert args.use_cls_token is False
    assert args.pin_mem is False
    args = stage2_parser().parse_args(["--use_cls", "--no_save_ckpt",
                                       "--no_auto_reload"])
    assert args.use_mean_pooling is False
    assert args.save_ckpt is False and args.auto_reload is False


def test_stage2_lr_schedule_families():
    """lr_tables must reproduce run_stage2.py:651-667: cosine (default),
    constant (flat after warmup), step (decays at lr_step_epochs; the
    reference's scalar step_fraction is broadcast per milestone — indexing
    a scalar is a latent TypeError in its own 'step' branch)."""
    from unite_tpu.train import common

    class A:
        lr = 0.1
        min_lr = 0.0
        warmup_lr = 0.0
        warmup_epochs = 1
        warmup_steps = -1
        epochs = 4
        weight_decay = 0.05
        weight_decay_end = None
        batch_size = 256 // jax.device_count()
        num_sample = 1

    niter = 10
    a = A()
    a.lr_schedule = "constant"
    tab, _, lr = common.lr_tables(a, niter)
    assert len(tab) == 40
    np.testing.assert_allclose(tab[10:], lr)  # flat after warmup
    assert tab[0] < tab[9] <= lr  # linear warmup

    a = A()
    a.lr_schedule = "step"
    a.lr_step_epochs = [2, 3]
    a.step_fraction = 0.1
    tab, _, lr = common.lr_tables(a, niter)
    np.testing.assert_allclose(tab[10:20], lr)
    np.testing.assert_allclose(tab[20:30], lr * 0.1)
    np.testing.assert_allclose(tab[30:], lr * 0.01)

    a = A()
    a.lr_schedule = "step"
    a.lr_step_epochs = None
    with pytest.raises(ValueError, match="lr_step_epochs"):
        common.lr_tables(a, niter)

    a = A()
    a.lr_schedule = "cosine"
    tab, _, lr = common.lr_tables(a, niter)
    assert tab[10] == pytest.approx(lr, rel=1e-6) and tab[-1] < tab[10]


def test_remat_num_is_output_invariant():
    """use_checkpoint/checkpoint_num (reference modeling_adaptation.py:158
    'idx < checkpoint_num') only trades memory for recompute — outputs and
    grads must be identical with remat off, on, and partial."""
    from unite_tpu.models.vit import VisionTransformer

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 2, 16, 16, 3)), jnp.float32)

    def run(**kw):
        m = VisionTransformer(
            img_size=16, patch_size=8, all_frames=2, tubelet_size=1,
            embed_dim=32, depth=3, num_heads=2, num_classes=5, **kw)
        p = m.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            return jnp.sum(m.apply({"params": p}, x) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return float(l), g

    l0, g0 = run()
    for kw in ({"remat": True}, {"remat": True, "remat_num": 2},
               {"remat": True, "remat_num": 0}):
        l1, g1 = run(**kw)
        assert l1 == pytest.approx(l0, rel=1e-6), kw
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-6), g0, g1)


def test_umt_step_controls_dense_stride(tmp_path):
    """--umt_step is the dense-mode temporal stride (reference build.py:93
    new_step=args.umt_step, mae.py:130-131 skip_length=new_length*new_step);
    sparse mode pins new_step=1 (mae.py:142-146 makes umt_step>1 degenerate
    there)."""
    from unite_tpu.data.build import build_pretraining_dataset

    ann = tmp_path / "a.csv"
    ann.write_text("vid_000 0\nvid_001 1\n")

    class A:
        num_frames = 8
        tubelet_size = 1
        input_size = 32
        patch_size = 8
        mask_type = "tube"
        mask_ratio = 0.5
        data_path = ""
        split = " "
        num_segments = 1
        umt_step = 2

    ds = build_pretraining_dataset(A(), anno_path=str(ann))
    assert ds.new_step == 2 and ds.skip_length == 16
    A.num_segments = 8
    ds = build_pretraining_dataset(A(), anno_path=str(ann))
    assert ds.new_step == 1 and ds.skip_length == 1


def test_source_stream_repetition_direction():
    """Stream length-matching repeats the SMALLER stream: target smaller →
    target repeated ceil(src/tgt); target larger → SOURCE repeated
    ceil(tgt/src) (run_stage1.py:711-752, run_stage3.py:1096-1124)."""
    from unite_tpu.data.sharding import repetitions_to_match

    # target smaller: tgt reps ceil(20/8)=3, source stays 1
    assert repetitions_to_match(8, 20) == 3
    assert repetitions_to_match(20, 8) == 1  # larger stream never repeats
    # the entry logic: source reps when target is larger
    n_src, n_tgt = 8, 20
    src_reps = (repetitions_to_match(n_src, n_tgt)
                if n_tgt > n_src else 1)
    assert src_reps == 3


# --- entry-level behavior (tiny models, synthetic data) ----------------------

@pytest.mark.slow
def test_stage3_eval_mode_runs_final_test_only(tmp_path):
    """--eval: final multi-view test + merge, no training — the intent of
    the reference's commented-out eval block (run_stage3.py:1280-1293)."""
    import os
    from tests.test_stage3_zeroshot import _stage3_args
    from unite_tpu.train.run_stage3 import main

    args = _stage3_args(tmp_path, eval=True, epochs=3,
                        selection_strategy="conf")
    main(args)
    out = args.output_dir
    # final_test preds file written, NO training checkpoints, log has the
    # test stats only
    assert os.path.exists(os.path.join(out, "0.txt"))
    assert not any(f.startswith("checkpoint-") for f in os.listdir(out))
    with open(os.path.join(out, "log.txt")) as f:
        recs = [line for line in f if "test_acc1" in line]
    assert recs, "final test stats not logged"


@pytest.mark.slow
def test_stage1_checkpoints_disabled_writes_nothing(tmp_path):
    """checkpoints_enabled=false (the reference YAML default,
    run_stage1.py:880 gate) must suppress every checkpoint write, including
    the preemption path."""
    import os
    from tests.test_preemption import _stage1_args
    from unite_tpu.train.run_stage1 import main

    args = _stage1_args(tmp_path, tmp_path / "o", 1, with_target=False)
    args.checkpoints_enabled = False
    main(args)
    files = os.listdir(args.output_dir)
    assert not any(f.startswith("checkpoint-") for f in files), files
    assert "log.txt" in files  # stats still logged


@pytest.mark.slow
def test_stage1_repeats_source_when_target_larger(tmp_path):
    """Target stream larger than source: the SOURCE is repeated
    ceil(tgt/src) — the reference grows the epoch this way
    (run_stage1.py:721-736); before this fix only the target was ever
    repeated and epochs stayed short."""
    import json
    import os
    from tests.test_preemption import _stage1_args
    from tests.test_entry_resume import _write_annotations
    from unite_tpu.train.run_stage1 import main

    args = _stage1_args(tmp_path, tmp_path / "rep", 1, n_source=16)
    args.ann_file_train_target = _write_annotations(tmp_path, "big.csv", 40)
    main(args)
    # host batch 8: source 16 → 2 steps/epoch unrepeated; target 40 needs
    # ceil(40/16)=3 source repetitions → 48 rows → 6 optimizer steps
    from unite_tpu.utils import checkpoint as ck

    payload = ck.auto_load_model(args.output_dir)
    assert payload["extra"]["step"] == 6, payload["extra"]


def test_stage3_head_loads_from_student_init(tmp_path):
    """The reference ALWAYS takes the stage-3 classifier head from
    student_init (run_stage3.py:1203-1211) — the stage-2 checkpoint carries
    head.*; src_classifier_init is an explicit override; shape mismatches
    are skipped like its non-strict load."""
    import os
    import torch

    from unite_tpu.train.run_stage3 import load_classifier_head
    from unite_tpu.utils import checkpoint as ck

    fresh = {"kernel": np.zeros((32, 3), np.float32),
             "bias": np.zeros(3, np.float32)}

    # (a) framework stage-2 msgpack: head under model.head
    want = np.arange(96, dtype=np.float32).reshape(32, 3)
    ck.save_checkpoint(str(tmp_path / "s2"), 0,
                       {"head": {"kernel": want, "bias": np.ones(3)}},
                       tags=("latest",))

    class A:
        student_init = str(tmp_path / "s2" / "checkpoint-latest.msgpack")
        src_classifier_init = ""
        model_key = "model|module"
        eval = False

    got = load_classifier_head(A, fresh)
    np.testing.assert_array_equal(got["kernel"], want)

    # (b) torch .pth stage-2 checkpoint (reference format)
    pth = tmp_path / "s2.pth"
    torch.save({"model": {"head.weight": torch.tensor(want.T),
                          "head.bias": torch.zeros(3)}}, pth)
    A.student_init = str(pth)
    got = load_classifier_head(A, fresh)
    np.testing.assert_array_equal(got["kernel"], want)

    # (c) stage-3 combined msgpack under --eval: head under model.classifier
    ck.save_checkpoint(str(tmp_path / "s3"), 1,
                       {"model": {"encoder": {}},
                        "classifier": {"kernel": want + 1,
                                       "bias": np.zeros(3)}},
                       tags=("latest",))
    A.student_init = str(tmp_path / "s3" / "checkpoint-latest.msgpack")
    A.eval = True
    got = load_classifier_head(A, fresh)
    np.testing.assert_array_equal(got["kernel"], want + 1)

    # (d) shape mismatch (e.g. K710 head) is skipped, init kept
    ck.save_checkpoint(str(tmp_path / "big"), 0,
                       {"head": {"kernel": np.zeros((32, 710), np.float32),
                                 "bias": np.zeros(710)}}, tags=("latest",))
    A.student_init = str(tmp_path / "big" / "checkpoint-latest.msgpack")
    A.eval = False
    got = load_classifier_head(A, fresh)
    np.testing.assert_array_equal(got["kernel"], fresh["kernel"])

    # (e) reference-style src_classifier_latest.pth next to student_init
    # wins under --eval (run_stage3.py:1213-1219)
    clsf = tmp_path / "s2dir"
    os.makedirs(clsf, exist_ok=True)
    torch.save({"weight": torch.tensor(want.T * 2), "bias": torch.zeros(3)},
               clsf / "src_classifier_latest.pth")
    torch.save({"model": {"head.weight": torch.tensor(want.T),
                          "head.bias": torch.zeros(3)}},
               clsf / "student.pth")
    A.student_init = str(clsf / "student.pth")
    A.eval = True
    got = load_classifier_head(A, fresh)
    np.testing.assert_array_equal(got["kernel"], want * 2)


def test_bare_boolean_cli_wins_over_yaml(tmp_path):
    """A bare reference-style flag (--checkpoints_enabled) must override a
    YAML false through parse_with_config's CLI-wins re-parse — the exact
    combination the reference ships (YAML checkpoints_enabled: false +
    stage1.sh:27 passing the bare flag)."""
    from unite_tpu.config import parse_with_config

    cfg = tmp_path / "c.yaml"
    cfg.write_text("checkpoints_enabled: false\nuse_checkpoint: false\n")
    args = parse_with_config(
        stage1_parser(),
        ["--config", str(cfg), "--checkpoints_enabled"])
    assert args.checkpoints_enabled is True   # bare CLI beats YAML false
    assert args.use_checkpoint is False       # YAML still applies elsewhere
