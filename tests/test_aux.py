"""Tests: functional shim, kNN eval, mesh helpers, diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np


def test_functional_shim():
    from unite_tpu.data import functional as F

    clip = np.arange(2 * 8 * 10 * 3, dtype=np.float32).reshape(2, 8, 10, 3)
    out = F.crop_clip(clip, 2, 3, 4, 5)
    assert out.shape == (2, 4, 5, 3)
    assert F.get_resize_sizes(100, 50, 25) == (50, 25)
    assert F.get_resize_sizes(50, 100, 25) == (25, 50)
    norm = F.normalize(np.ones((1, 2, 2, 3)), [0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(norm, 1.0)
    assert F.resize_clip(clip, 16).shape[1] in (16, 20)


def test_knn_classifier_separable():
    from unite_tpu.utils.knn import knn_classifier

    rng = np.random.default_rng(0)
    # two well-separated clusters
    train = np.concatenate([rng.normal(0, 0.1, (50, 8)),
                            rng.normal(3, 0.1, (50, 8))])
    train_labels = np.array([0] * 50 + [1] * 50)
    test = np.concatenate([rng.normal(0, 0.1, (20, 8)),
                           rng.normal(3, 0.1, (20, 8))])
    test_labels = np.array([0] * 20 + [1] * 20)
    top1, top5 = knn_classifier(train, train_labels, test, test_labels, k=5)
    assert top1 == 100.0


def test_cast_videos_bf16():
    import ml_dtypes

    from unite_tpu.parallel.mesh import cast_videos_bf16

    batch = {"videos": np.zeros((2, 4, 8, 8, 3), np.float32),
             "labels": np.zeros(2, np.int32),
             "clip_sim": np.zeros((2, 5), np.float32)}
    out = cast_videos_bf16(batch)
    assert out["videos"].dtype == ml_dtypes.bfloat16
    assert out["labels"].dtype == np.int32
    assert out["clip_sim"].dtype == np.float32  # 2-D untouched


def test_normalize_videos_uint8_vs_fp32():
    from unite_tpu.data.transforms import tensor_normalize
    from unite_tpu.ops.normalize import normalize_videos

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (2, 2, 4, 4, 3)).astype(np.uint8)
    on_device = np.asarray(normalize_videos(jnp.asarray(u8), jnp.float32))
    host = np.stack([tensor_normalize(c) for c in u8])
    np.testing.assert_allclose(on_device, host, atol=1e-5)
    # float passthrough just casts
    f = jnp.ones((1, 1, 2, 2, 3), jnp.float32)
    assert normalize_videos(f).dtype == jnp.bfloat16


def test_compare_model_predictions():
    from unite_tpu.engines.selftrain import compare_model_predictions

    logits = np.array([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0]])
    sims = np.array([[0.9, 0.1], [0.9, 0.1], [0.1, 0.9]])
    target = np.array([0, 1, 1])
    d = compare_model_predictions(logits, sims, target)
    assert d["student_acc"] == 2 / 3
    assert d["clip_acc"] == 2 / 3
    assert d["student_clip_agree"] == 1
    assert d["student_clip_disagree"] == 2
    assert d["student_or_clip_correct"] == 1.0
    assert d["student_clip_agree_correct"] == 1
    assert d["student_clip_disagree_incorrect"] == 1


def test_shard_batch_divisibility():
    from unite_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    batch = shard_batch({"videos": np.zeros((16, 2, 4, 4, 3), np.float32)}, mesh)
    assert batch["videos"].shape[0] == 16
    try:
        shard_batch({"videos": np.zeros((15, 2, 4, 4, 3), np.float32)}, mesh)
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_wandb_offline_sink(tmp_path):
    """--disable_wandb false without the wandb package mirrors every log()
    dict to <output_dir>/wandb.jsonl (the reference's 4th sink,
    run_stage1.py:634-646, replaced for zero-egress environments)."""
    import json
    import types

    from unite_tpu.utils.logging import maybe_wandb

    args = types.SimpleNamespace(disable_wandb=False,
                                 output_dir=str(tmp_path), wandb_group=None)
    wb = maybe_wandb(args)
    assert wb is not None
    wb.log({"train/loss": 1.5, "train/lr": 1e-3})
    wb.log({"train/loss": 1.25})
    wb.finish()
    recs = [json.loads(l) for l in open(tmp_path / "wandb.jsonl")]
    assert len(recs) == 2
    assert recs[0]["train/loss"] == 1.5 and recs[0]["_step"] == 0
    assert recs[1]["_step"] == 1

    args.output_dir = str(tmp_path / "scrap_run")
    assert maybe_wandb(args) is None  # 'scrap' in output_dir disables


def test_device_peak_mem_meter(monkeypatch, capsys):
    """The log line appends 'max mem' where the backend exposes memory
    stats (the reference's CUDA max_memory_allocated analogue,
    utils.py:338-352) and omits it cleanly where it doesn't (CPU, axon
    tunnel returns None)."""
    import types

    import jax

    from unite_tpu.utils import metrics as M

    assert M._device_peak_mb() is None  # CPU backend has no stats

    fake = types.SimpleNamespace(
        memory_stats=lambda: {"peak_bytes_in_use": 64 * 1024 * 1024})
    monkeypatch.setattr(jax, "local_devices", lambda: [fake])
    assert M._device_peak_mb() == 64.0
    lg = M.MetricLogger()
    for _ in lg.log_every(range(2), 1, "H:"):
        lg.update(loss=1.0)
    out = capsys.readouterr().out
    assert "max mem: 64MB" in out


def test_data_parallel_jit_static_argnums():
    """static args are removed from jit's dynamic positional tuple before
    in_shardings is matched — data_parallel_jit must skip them when
    building the shardings list or the first call raises ValueError."""
    import jax
    import jax.numpy as jnp

    from unite_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()

    def step(state, batch, flag):
        scale = 2.0 if flag else 1.0
        return state, {"loss": jnp.mean(batch["x"]) * scale}

    fn = pmesh.data_parallel_jit(step, mesh, state_argnums=(0,),
                                 batch_argnums=(1,), static_argnums=(2,),
                                 donate_state=False)
    state = pmesh.replicate({"w": jnp.ones((3,))}, mesh)
    batch = pmesh.shard_batch({"x": np.ones((8, 3), np.float32)}, mesh)
    _, m = fn(state, batch, True)
    assert float(m["loss"]) == 2.0
