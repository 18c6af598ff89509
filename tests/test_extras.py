"""Tests for the auxiliary components: VideoMAE engine, extra datasets,
FLOPs, LP-FT mask, schedule-count restore, text tower."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.data.video_reader import SyntheticVideoReader


def test_videomae_pixel_targets_normalized():
    from unite_tpu.engines.pretrain_videomae import masked_pixel_targets, patchify

    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    mask_idx = jnp.asarray([[0, 3], [1, 2]])
    t = masked_pixel_targets(videos, mask_idx, patch_size=16, tubelet_size=1)
    assert t.shape == (2, 2, 16 * 16 * 3)
    # per-patch normalization: near-zero mean, ~unit std per patch
    per_patch = np.asarray(t).reshape(2, 2, 256, 3)
    np.testing.assert_allclose(per_patch.mean(axis=2), 0.0, atol=1e-4)
    # unnormalized mode returns raw pixels in patch order
    raw = masked_pixel_targets(videos, mask_idx, 16, 1, normalize_target=False)
    p = patchify(videos.astype(jnp.float32) * jnp.asarray([0.229, 0.224, 0.225])
                 + jnp.asarray([0.485, 0.456, 0.406]), 16, 1)
    np.testing.assert_allclose(
        np.asarray(raw[0, 0]), np.asarray(p[0, 0]), atol=1e-5)


def test_videomae_train_step():
    from unite_tpu.engines.pretrain_videomae import make_videomae_train_step
    from unite_tpu.models.pretrain_videomae import PretrainVideoMAE
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState

    m = PretrainVideoMAE(
        img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, decoder_num_classes=3 * 16 * 16,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        num_frames=4, tubelet_size=1,
    )
    videos = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    vis_idx = jnp.tile(jnp.arange(10)[None], (2, 1))
    mask_idx = jnp.tile(jnp.arange(10, 16)[None], (2, 1))
    params = m.init(jax.random.PRNGKey(0), videos, vis_idx, mask_idx)["params"]
    tx, _ = create_optimizer("adamw", lr=1e-3, params=params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_videomae_train_step(m, patch_size=16, tubelet_size=1))
    batch = {"videos": videos, "vis_idx": vis_idx, "mask_idx": mask_idx}
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ssv2_raw_frame_index_arithmetic():
    """Exact reference arithmetic (ssv2.py:277-322), hand-computed:
    validation = arange(T)*avg + avg//2; test = the sorted tick grid over
    ALL test segments (NOT the kinetics TSN math the class used to
    inherit: for 100 frames / 8 segments val is [6,18,30,...], not the
    round-based [6,18,31,...])."""
    from unite_tpu.data.samplers import ssv2_raw_frame_indices

    val = ssv2_raw_frame_indices(100, 8, "validation")
    assert val == [12 * i + 6 for i in range(8)]
    # test grid: tick = 100/8 = 12.5; t_seg in {0,1}
    got = ssv2_raw_frame_indices(100, 8, "test", test_num_segment=2)
    want = sorted([int(t * 12.5 / 2 + 12.5 * x)
                   for t in range(2) for x in range(8)])
    assert got == want
    # short video: zero-padded ramp
    assert ssv2_raw_frame_indices(3, 8, "validation") == [0] * 5 + [0, 1, 2]
    # train randint(avg) offsets stay inside their segments
    rng = np.random.default_rng(0)
    tr = ssv2_raw_frame_indices(100, 8, "train", rng=rng)
    assert all(12 * i <= v < 12 * i + 12 for i, v in enumerate(tr))


def test_ssv2_raw_frames_test_protocol(tmp_path):
    """Raw-frame TEST views slice the full tick grid temporally
    ([chunk_nb::test_num_segment]) and window spatially (ssv2.py:179-210)
    — the decord-ssv2 protocol shape, not the kinetics (chunk,crop)
    re-decode."""
    import cv2

    from unite_tpu.data.datasets_extra import SSRawFrameClsDataset

    d = tmp_path / "vid1"
    d.mkdir()
    for i in range(1, 21):
        cv2.imwrite(str(d / f"img_{i:05}.jpg"),
                    np.full((48, 64, 3), i * 10 % 255, np.uint8))
    anno = tmp_path / "anno.csv"
    anno.write_text(f"{d} 20 1\n")
    ds = SSRawFrameClsDataset(
        str(anno), sep=" ", mode="test", clip_len=4, crop_size=32,
        short_side_size=40, test_num_segment=2, test_num_crop=3)
    assert len(ds) == 2 * 3 * 1
    clip, label, vid, ck, cp = ds[0]
    # grid has 2*4 frames; view = every 2nd -> clip_len frames
    assert clip.shape[0] == 4 and label == 1
    assert clip.shape[1] == 40 and clip.shape[2] == 40
    views = {(it[3], it[4]) for it in (ds[i] for i in range(len(ds)))}
    assert views == {(c, p) for c in range(2) for p in range(3)}


def test_dense_dataset(tmp_path):
    from unite_tpu.data.datasets_extra import VideoClsDatasetDense

    p = tmp_path / "a.csv"
    p.write_text("\n".join(f"/f/v{i}.mp4 {i % 2}" for i in range(4)))
    ds = VideoClsDatasetDense(
        str(p), mode="train", clip_len=4, crop_size=32, short_side_size=48,
        frame_sample_rate=2, reader=SyntheticVideoReader(64, 64), seed=0,
        aa="", reprob=0.0,
    )
    clip, label, _, _ = ds[0]
    assert clip.shape == (4, 32, 32, 3)
    ds_test = VideoClsDatasetDense(
        str(p), mode="test", clip_len=4, crop_size=32, short_side_size=32,
        test_num_segment=3, test_num_crop=1, frame_sample_rate=2,
        reader=SyntheticVideoReader(64, 64),
    )
    clip, label, vid, ck, cp = ds_test[0]
    assert clip.shape[0] == 4


def test_ssv2_raw_frames(tmp_path):
    import cv2

    from unite_tpu.data.datasets_extra import SSRawFrameClsDataset

    # create a frame folder with img_00001..img_00012
    d = tmp_path / "vid0"
    d.mkdir()
    for i in range(1, 13):
        cv2.imwrite(str(d / f"img_{i:05}.jpg"),
                    np.full((48, 64, 3), i * 20, np.uint8))
    anno = tmp_path / "anno.csv"
    anno.write_text(f"{d} 12 3\n")
    ds = SSRawFrameClsDataset(
        str(anno), sep=" ", mode="validation", clip_len=4, crop_size=32,
        short_side_size=40,
    )
    clip, label, vid = ds[0]
    assert clip.shape == (4, 32, 32, 3)
    assert label == 3
    assert ds.no_horizontal_flip  # SSV2 semantics
    assert ds._frame_counts[str(d)] == 12


def test_flops_utils():
    from unite_tpu.utils.flops import vit_block_flops, vit_flops

    # ViT-B on 1568 tokens ≈ 357 GFLOP/clip forward (attention is ~25%)
    f = vit_flops(1568, 768, 12)
    assert 2e11 < f < 5e11
    assert vit_block_flops(196, 768) > 0


def test_set_schedule_count():
    import optax

    from unite_tpu.optim.factory import create_optimizer, set_schedule_count

    params = {"w": jnp.ones((2, 2))}
    table = np.array([1.0, 0.1, 0.01, 0.001], np.float32)
    tx, _ = create_optimizer("sgd", lr=table, params=params, momentum=0.0)
    st = tx.init(params)
    st = set_schedule_count(st, 2)
    updates, _ = tx.update({"w": jnp.ones((2, 2))}, st, params)
    np.testing.assert_allclose(float(-updates["w"][0, 0]), 0.01, rtol=1e-6)


def test_set_schedule_count_internally_coupled_wd():
    """AdamP/SGDP/NovoGrad couple the decay lookup inside their direction
    state (no .inner): after an LP-FT rebuild, set_schedule_count must
    fast-forward their wd-table index via the wd_base offset WITHOUT
    touching count — count drives bias correction / moment bootstrap,
    which a rebuilt torch optimizer restarts at zero (ADVICE r4)."""
    from unite_tpu.optim.factory import create_optimizer, set_schedule_count

    params = {"w": jnp.ones((2, 2))}
    wd_table = np.array([0.5, 0.4, 0.3, 0.2], np.float32)
    g = {"w": jnp.full((2, 2), 0.3)}
    for name in ("sgdp", "adamp", "novograd"):
        tx, _ = create_optimizer(name, lr=1.0, params=params,
                                 weight_decay=wd_table, momentum=0.9)
        st = tx.init(params)
        ff = set_schedule_count(st, 3)
        # a fresh optimizer whose wd table was REWRITTEN to start at index
        # 3 is the semantics torch LP-FT gets (external per-step wd writes)
        tx_ref, _ = create_optimizer(name, lr=1.0, params=params,
                                     weight_decay=wd_table[3:],
                                     momentum=0.9)
        u_ff, st2 = tx_ref.update(g, tx_ref.init(params), params)
        u_got, got2 = tx.update(g, ff, params)
        np.testing.assert_allclose(np.asarray(u_got["w"]),
                                   np.asarray(u_ff["w"]), rtol=1e-6,
                                   err_msg=name)
        # and the offset persists across steps
        u_got2, _ = tx.update(g, got2, params)
        u_ff2, _ = tx_ref.update(g, st2, params)
        np.testing.assert_allclose(np.asarray(u_got2["w"]),
                                   np.asarray(u_ff2["w"]), rtol=1e-6,
                                   err_msg=name)


def test_restore_migrates_grown_optimizer_state():
    """A checkpoint written before AdamPState/SGDPState/NovoState gained
    the wd_base field must still restore its moments: restore_train_state
    forward-migrates missing NamedTuple entries from the fresh init
    instead of silently falling back to schedule-only (zeroed moments)."""
    from flax import serialization as ser

    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState
    from unite_tpu.utils.checkpoint import restore_train_state

    params = {"w": jnp.ones((2, 2))}
    g = {"w": jnp.full((2, 2), 0.3)}
    for name in ("sgdp", "adamp", "novograd"):
        tx, _ = create_optimizer(name, lr=1e-2, params=params,
                                 weight_decay=0.05, momentum=0.9)
        state = TrainState.create(params, tx)
        state = state.apply_gradients(g)  # non-trivial moments
        sd = ser.to_state_dict(state.opt_state)

        def strip(d):
            if isinstance(d, dict):
                return {k: strip(v) for k, v in d.items() if k != "wd_base"}
            return d

        old_payload = {"model": params, "optimizer": strip(sd),
                       "extra": {"step": 1}}
        fresh = TrainState.create(params, tx)
        restored = restore_train_state(fresh, old_payload)
        new_sd = ser.to_state_dict(restored.opt_state)

        def leaves(d, out):
            for k, v in d.items():
                if isinstance(v, dict):
                    leaves(v, out)
                else:
                    out[len(out)] = (k, np.asarray(v))

        want, got = {}, {}
        leaves(strip(sd), want)
        leaves(strip(new_sd), got)
        for i in want:
            np.testing.assert_array_equal(want[i][1], got[i][1],
                                          err_msg=f"{name}:{want[i][0]}")
        # a payload with UNKNOWN keys still takes the schedule fallback
        bad = {"model": params, "extra": {"step": 3},
               "optimizer": {**strip(sd), "bogus": np.zeros(1)}}
        rb = restore_train_state(TrainState.create(params, tx), bad)
        assert int(rb.step) == 3  # restored step, schedule-only path


def test_sched_values_mid_accumulation_phase():
    """Schedule meters on a mid-accumulation resume: make_sched(phase=
    skip0 % k) must index the tables by floor((skip0 + step_i)/k) — the
    reference's it = start_steps + data_iter_step // update_freq
    (engine_for_finetuning.py:71-74) — not floor(skip0/k) + floor(step_i/k),
    which lags one optimizer step whenever skip0 % k != 0."""
    from unite_tpu.train import common

    tab = np.arange(10, dtype=np.float64)
    k = 2
    full = common.make_sched(tab, tab, 0, every_k=k)
    want = [common._sched_values(full, i)["lr"] for i in range(6)]
    skip0 = 3  # preempted mid-window: one batch into optimizer step 1
    resumed = common.make_sched(tab, tab, skip0 // k, every_k=k,
                                phase=skip0 % k)
    got = [common._sched_values(resumed, i)["lr"] for i in range(3)]
    assert got == want[skip0:]


def test_clip_text_transformer_shapes():
    from unite_tpu.models.clip_text import CLIPTextTransformer

    m = CLIPTextTransformer(vocab_size=64, context_length=8, width=16,
                            layers=2, heads=2, embed_dim=12)
    tokens = jnp.asarray([[5, 9, 63, 0, 0, 0, 0, 0],
                          [5, 2, 3, 63, 0, 0, 0, 0]])
    params = m.init(jax.random.PRNGKey(0), tokens)["params"]
    feats = m.apply({"params": params}, tokens)
    assert feats.shape == (2, 12)
    # eot pooling picks the highest token id position: changing a token
    # AFTER eot (padding) must not change features... padding is 0s which
    # are attended causally before eot only if position < eot; token at
    # position beyond eot influences nothing for causal attention pooling
    tokens2 = tokens.at[0, 6].set(1)
    feats2 = m.apply({"params": params}, tokens2)
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(feats2[0]),
                               atol=1e-5)


def test_clip_cls_features_mode():
    from unite_tpu.models.clip import CLIPVisionTransformer

    m = CLIPVisionTransformer(
        input_resolution=32, patch_size=16, width=32, layers=2, heads=2,
        output_dim=24, return_attn=True, return_index=(0, 1),
    )
    v = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 32, 32, 3)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), v)["params"]
    feats = m.apply({"params": params}, v, None, True)
    assert feats.shape == (8, 24)  # [B*T, output_dim]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)
