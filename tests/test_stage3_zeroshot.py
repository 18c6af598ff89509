"""Stage-3 zero-shot teacher: tokenizer golden parity + fallback policy.

The clip_matchORconf selection strategy (reference run_stage3.py:556-593) is
load-bearing on real CLIP text features (utils.py:44-82). Without them the
entry must hard-error — a uniform-similarity fallback silently becomes a
different (biased) selection rule — unless --allow_uniform_clip.
"""

import json
import os

import numpy as np
import pytest

# registers the tiny test models used by the entry-level smoke test
import tests.test_entry_resume  # noqa: F401
from unite_tpu.models.clip_text import SimpleTokenizer

MERGES = [
    "#version: 0.2", "h e", "l l", "he ll", "hell o</w>", "a</w>",
    "p e", "pe r", "per son</w>", "s o", "so n</w>", "v i", "vi deo</w>",
    "d e", "de o</w>", "o f</w>",
]


@pytest.fixture
def merges_path(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text("\n".join(MERGES) + "\n")
    return str(p)


def test_tokenizer_matches_canonical_clip_tokenizer(tmp_path, merges_path):
    """Golden parity vs transformers.CLIPTokenizer — an independent
    implementation of OpenAI CLIP's BPE spec — on the same merges table:
    identical ids for case folding, punctuation splits, digits, and byte
    fallback."""
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    from transformers import CLIPTokenizer

    tok = SimpleTokenizer(merges_path)
    vocab_file = tmp_path / "vocab.json"
    vocab_file.write_text(json.dumps(tok.encoder))
    ht = CLIPTokenizer(vocab_file=str(vocab_file), merges_file=merges_path)

    prompts = [
        "a video of a person",
        "hello person",
        "A PERSON!!",
        "person, hello; 42 videos",
        "  spaced   out  ",
        "café person",  # non-ascii → byte-level fallback
    ]
    for text in prompts:
        ours = tok.encode(text)
        theirs = ht(text)["input_ids"][1:-1]  # strip bos/eos
        assert ours == theirs, (text, ours, theirs)

    ids = tok.tokenize(["a video of a person"], context_length=77)
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.encoder["<|startoftext|>"]


def _stage3_args(tmp_path, **overrides):
    from unite_tpu.config import parse_with_config
    from unite_tpu.train.args import stage3_parser
    from tests.test_entry_resume import _write_annotations

    args = parse_with_config(stage3_parser(), [])
    args.model = "adaptation_test_tiny"
    args.clip_teacher = "clip_test_tiny"
    args.clip_return_layers = [0]
    args.clip_input_resolution = 32
    args.ann_file_train = _write_annotations(tmp_path, "src.csv", 16)
    args.ann_file_train_target = _write_annotations(tmp_path, "tgt.csv", 16)
    args.ann_file_val = _write_annotations(tmp_path, "val.csv", 8)
    args.ann_file_test = _write_annotations(tmp_path, "test.csv", 2)
    args.nb_classes = 3
    args.data_set = "Kinetics_sparse"  # class count from args (Daily-DA)
    args.synthetic_data = True
    args.input_size = 32
    args.short_side_size = 32
    args.patch_size = 8
    args.num_frames = 2
    args.tubelet_size = 1
    args.mask_ratio = 0.5
    args.batch_size = 1  # per-chip; x8 fake devices = host batch 8
    args.batch_size_val = 1
    args.epochs = 1
    args.warmup_epochs = 0
    args.num_workers = 2
    args.log_freq = 1
    args.output_dir = str(tmp_path / "out")
    args.overwrite = "allow"
    args.test_best = False
    args.test_num_segment = 1
    args.test_num_crop = 1
    args.seed = 11
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def test_stage3_clip_strategy_requires_text_features(tmp_path):
    from unite_tpu.train.run_stage3 import main

    with pytest.raises(RuntimeError, match="zero-shot teacher"):
        main(_stage3_args(tmp_path, selection_strategy="clip_matchORconf"))


@pytest.mark.slow
def test_stage3_entry_smoke_with_escape_hatch(tmp_path):
    """Full stage-3 entry runs end-to-end with --allow_uniform_clip and the
    compare_model_predictions table lands in log.txt; also exercises the
    analysis exports (--save_preds_path → preds/labels/probs .npy, the
    reference's run_stage3.py:1297 intent) and the kNN probe."""
    from unite_tpu.train.run_stage3 import main

    preds_dir = str(tmp_path / "preds")
    from tests.test_entry_resume import _write_annotations

    main(_stage3_args(tmp_path, selection_strategy="clip_matchORconf",
                      allow_uniform_clip=True, save_preds_path=preds_dir,
                      initial_validation=True, knn_eval=True,
                      # separate gallery split (the *_sourceonly mappings'
                      # ann_file_train_knn key) instead of ds_source
                      ann_file_train_knn=_write_annotations(
                          tmp_path, "knn.csv", 8),
                      knn_max_videos=8, disable_wandb=False))
    # reference wandb surface: pre-adaptation (run_stage3.py:1299),
    # per-epoch val + epoch marker (:1351,:1384), final test (:1413),
    # per-step train/* (:685-703) — all mirrored to wandb.jsonl
    wtxt = open(os.path.join(str(tmp_path / "out"), "wandb.jsonl")).read()
    for key in ("pre-adaptation/acc1", "val/acc1", "\"epoch\"",
                "test/acc1", "train/loss"):
        assert key in wtxt, key
    for sub in ("initial", "epoch0"):
        for name in ("preds.npy", "labels.npy", "probs.npy"):
            path = os.path.join(preds_dir, sub, name)
            assert os.path.exists(path), path
    preds = np.load(os.path.join(preds_dir, "epoch0", "preds.npy"))
    probs = np.load(os.path.join(preds_dir, "epoch0", "probs.npy"))
    assert preds.shape[0] == probs.shape[0] == 8  # val videos
    assert probs.shape[1] == 3
    recs = [json.loads(line)
            for line in open(os.path.join(str(tmp_path / "out"), "log.txt"))]
    train_recs = [r for r in recs if "train_loss" in r]
    assert train_recs, recs
    r = train_recs[0]
    # per-step selection diagnostics (ref run_stage3.py:676-703)
    for key in ("train_sel_ratio", "train_correct_precision",
                "train_correct_recall", "train_match_select_rate"):
        assert key in r, sorted(r)
    # epoch-level agreement table (ref run_stage3.py:789-817)
    for key in ("cmp_student_acc", "cmp_clip_acc", "cmp_student_clip_agree"):
        assert key in r, sorted(r)
    assert np.isfinite(r["train_loss"])


def test_stage3_precomputed_text_features(tmp_path):
    """--clip_text_features path: a [C, D] .npy enables the zero-shot fn."""
    import jax
    import jax.numpy as jnp

    from unite_tpu.models.clip_text import build_zero_shot_fn
    from unite_tpu.utils.registry import create_model

    feats = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    fp = tmp_path / "text_feats.npy"
    np.save(fp, feats)

    class A:
        clip_text_features = str(fp)
        clip_text_init = ""
        clip_bpe_path = ""
        nb_classes = 3

    teacher = create_model("clip_test_tiny", input_resolution=32,
                           return_attn=False, return_index=(1,))
    videos = jnp.zeros((2, 2, 32, 32, 3), jnp.float32)
    tp = teacher.init(jax.random.PRNGKey(0), videos, None, True)["params"]
    fn = build_zero_shot_fn(A, teacher, tp)
    assert fn is not None
    sim = np.asarray(fn(videos))
    assert sim.shape == (2, 3)
    np.testing.assert_allclose(sim.sum(-1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_stage3_entry_with_real_zero_shot_path(tmp_path):
    """Entry-level drive of the REAL zero-shot path (clip_matchORconf with
    --clip_text_features): clip_sim is computed device-side from the
    already-sharded target clips inside the batch generator (no host
    round-trip — ADVICE r4) and the run completes with finite losses and
    the match-rate diagnostics populated."""
    from unite_tpu.train.run_stage3 import main

    feats = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    fp = tmp_path / "text_feats.npy"
    np.save(fp, feats)
    main(_stage3_args(tmp_path, selection_strategy="clip_matchORconf",
                      clip_text_features=str(fp)))
    recs = [json.loads(line)
            for line in open(os.path.join(str(tmp_path / "out"), "log.txt"))]
    train_recs = [r for r in recs if "train_loss" in r]
    assert train_recs and np.isfinite(train_recs[0]["train_loss"])
    assert "train_match_select_rate" in train_recs[0]
