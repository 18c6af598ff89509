"""Data layer tests: samplers, sharding, transforms, datasets, loader."""

import numpy as np
import pytest

from unite_tpu.data import transforms as T
from unite_tpu.data.datasets import VideoClsDatasetSparse, VideoMAEPretrainDataset
from unite_tpu.data.loader import DataLoader, cycle, default_collate
from unite_tpu.data.rand_augment import rand_augment_transform
from unite_tpu.data.random_erasing import RandomErasing
from unite_tpu.data.samplers import (
    dense_frame_indices,
    pretrain_segment_indices,
    sparse_frame_indices,
    enumerate_test_views,
)
from unite_tpu.data.sharding import ShardedSampler, repetitions_to_match
from unite_tpu.data.video_reader import SyntheticVideoReader


# --- samplers ---------------------------------------------------------------


def test_sparse_indices_train_within_segments():
    rng = np.random.default_rng(0)
    for n in (8, 30, 100, 301):
        idx = sparse_frame_indices(n, 8, clip_idx=-1, rng=rng)
        assert len(idx) == 8
        assert all(0 <= i < n for i in idx)
        assert idx == sorted(idx) or n < 16  # near-sorted TSN draws


def test_sparse_indices_deterministic_views():
    a = sparse_frame_indices(100, 8, clip_idx=0, test_num_segment=5)
    b = sparse_frame_indices(100, 8, clip_idx=4, test_num_segment=5)
    assert a != b
    assert a == sparse_frame_indices(100, 8, clip_idx=0, test_num_segment=5)
    # validation protocol: clip 0 of 1 = segment midpoints
    v = sparse_frame_indices(16, 8, clip_idx=0, test_num_segment=1)
    assert all(0 <= i < 16 for i in v)


def test_sparse_indices_short_video():
    idx = sparse_frame_indices(3, 8, clip_idx=0)
    assert len(idx) == 8
    assert max(idx) <= 2


def test_dense_indices():
    idx = dense_frame_indices(100, 8, skip_frames=4, start=10)
    assert idx == [10, 14, 18, 22, 26, 30, 34, 38]
    idx = dense_frame_indices(10, 8, skip_frames=4, start=0)
    assert max(idx) == 9  # clamped


def test_pretrain_segment_indices():
    rng = np.random.default_rng(0)
    ids = pretrain_segment_indices(64, num_segments=8, skip_length=1,
                                   new_step=1, rng=rng)
    assert len(ids) == 8
    assert all(0 <= i < 64 for i in ids)
    # sparse mode: one frame per segment, spread across the video
    assert ids == sorted(ids)
    # short video falls back to zeros+1-1 = 0
    ids = pretrain_segment_indices(1, 8, 1, 1)
    assert ids == [0] * 8


def test_enumerate_test_views_order():
    grid = enumerate_test_views(2, 2, 3)
    assert len(grid) == 12
    assert grid[0] == (0, 0, 0)
    assert grid[1] == (0, 0, 1)
    assert grid[2] == (0, 1, 0)  # crop advances before chunk


# --- sharding ---------------------------------------------------------------


def test_sharded_sampler_partition():
    n, shards = 10, 4
    all_idx = []
    lens = set()
    for s in range(shards):
        smp = ShardedSampler(n, shards, s, shuffle=False)
        idx = smp.indices()
        lens.add(len(idx))
        all_idx.extend(idx)
    assert lens == {3}  # padded to 12 total
    assert set(all_idx) == set(range(10))


def test_sharded_sampler_repetitions():
    smp = ShardedSampler(5, 2, 0, shuffle=True, repetitions=3, seed=1)
    idx = smp.indices()
    assert len(idx) == 8  # ceil(15/2)
    smp.set_epoch(1)
    assert smp.indices() != idx  # epoch reshuffles


def test_sharded_sampler_drop_last():
    smp = ShardedSampler(10, 4, 0, shuffle=False, drop_last=True)
    assert len(smp) == 2  # floor semantics via (total - shards) ceil


def test_repetitions_to_match():
    assert repetitions_to_match(10, 100) == 10
    assert repetitions_to_match(100, 10) == 1
    assert repetitions_to_match(3, 10) == 4


# --- transforms -------------------------------------------------------------


def test_group_multiscale_crop():
    from PIL import Image

    frames = [Image.fromarray(np.zeros((120, 160, 3), np.uint8))] * 4
    crop = T.GroupMultiScaleCrop(64)
    out = crop(frames, np.random.default_rng(2))
    assert len(out) == 4
    assert out[0].size == (64, 64)


def test_stack_normalize_range():
    from PIL import Image

    frames = [Image.fromarray(np.full((8, 8, 3), 255, np.uint8))]
    arr = T.stack_normalize(frames)
    np.testing.assert_allclose(arr[0, 0, 0], (1.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD,
                               rtol=1e-5)


def test_spatial_sampling_modes():
    clip = np.random.default_rng(0).integers(0, 255, (4, 120, 160, 3)).astype(np.float32)
    out = T.spatial_sampling(clip, -1, crop_size=64, scale=(0.5, 1.0),
                             aspect_ratio=(0.75, 4 / 3),
                             rng=np.random.default_rng(1))
    assert out.shape == (4, 64, 64, 3)
    for si in (0, 1, 2):
        out = T.spatial_sampling(clip, si, min_scale=64, max_scale=64, crop_size=64)
        assert out.shape == (4, 64, 64, 3)
    # the three test crops differ
    o0 = T.spatial_sampling(clip, 0, 64, 64, 64)
    o2 = T.spatial_sampling(clip, 2, 64, 64, 64)
    assert not np.array_equal(o0, o2)


def test_group_random_crop_shared_window():
    """GroupRandomCrop (transforms.py:31-56): one window for all frames."""
    from PIL import Image
    from unite_tpu.data.transforms import GroupRandomCrop

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)
    frames = [Image.fromarray(base), Image.fromarray(base)]
    out = GroupRandomCrop(32)(frames, rng=np.random.default_rng(1))
    assert all(f.size == (32, 32) for f in out)
    # identical source + shared window -> identical crops
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))


def test_random_resized_crop_with_shift():
    """motion_shift RRC (video_transforms.py:595-639): output shape, value
    domain, and actual box drift across frames."""
    from unite_tpu.data.transforms import (
        random_resized_crop_with_shift,
        spatial_sampling,
    )
    rng = np.random.default_rng(3)
    clip = rng.integers(0, 255, (8, 64, 80, 3)).astype(np.uint8)
    out = random_resized_crop_with_shift(
        clip.astype(np.float32), 32, 32, rng=np.random.default_rng(0))
    assert out.shape == (8, 32, 32, 3)
    # first and last frame crops come from independent boxes -> differ
    assert not np.allclose(out[0], out[-1])
    out2 = spatial_sampling(
        clip.astype(np.float32), spatial_idx=-1, crop_size=32,
        scale=(0.5, 1.0), aspect_ratio=(0.9, 1.1), motion_shift=True,
        random_horizontal_flip=False, rng=np.random.default_rng(1))
    assert out2.shape == (8, 32, 32, 3)


def test_uniform_crop_positions():
    clip = np.arange(1 * 4 * 10 * 3, dtype=np.float32).reshape(1, 4, 10, 3)
    left = T.uniform_crop(clip, 4, 0)
    right = T.uniform_crop(clip, 4, 2)
    np.testing.assert_array_equal(left, clip[:, :, :4])
    np.testing.assert_array_equal(right, clip[:, :, 6:])


def test_rand_augment_runs_all_ops():
    from PIL import Image

    frames = [Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    ) for _ in range(2)]
    aug = rand_augment_transform("rand-m7-n4-mstd0.5-inc1")
    assert len(aug.ops) == 15
    assert aug.num_layers == 4
    for op in aug.ops:  # every op must run without error at full magnitude
        op.prob = 1.0
        out = op(frames, np.random.default_rng(7))
        assert out[0].size == (32, 32)


def test_rand_augment_affine_ops_honor_resample():
    """shear/translate must warp with the CONFIGURED interpolation, not
    PIL's default NEAREST (reference rand_augment.py:84-111 passes
    resample into img.transform via _check_args_tf)."""
    from PIL import Image

    from unite_tpu.data import rand_augment as ra

    img = Image.fromarray(np.random.default_rng(1).integers(
        0, 255, (32, 32, 3)).astype(np.uint8))
    for op in (lambda im, **kw: ra.shear_x(im, 0.3, **kw),
               lambda im, **kw: ra.shear_y(im, 0.3, **kw),
               lambda im, **kw: ra.translate_x_rel(im, 0.137, **kw),
               lambda im, **kw: ra.translate_y_rel(im, 0.137, **kw)):
        near = np.asarray(op(img, resample=Image.NEAREST))
        bic = np.asarray(op(img, resample=Image.BICUBIC))
        assert not np.array_equal(near, bic)


def test_rand_augment_policy_parse():
    aug = rand_augment_transform("rand-m3-n2-mstd0.5-inc1")
    assert aug.num_layers == 2
    assert aug.ops[0].magnitude == 3
    assert aug.ops[0].magnitude_std == 0.5


def test_random_erasing():
    clip = np.zeros((4, 32, 32, 3), np.float32)
    erase = RandomErasing(probability=1.0, mode="pixel", cube=True)
    out = erase(clip, np.random.default_rng(3))
    assert out.shape == clip.shape
    changed = np.abs(out).sum(axis=(1, 2, 3))
    assert (changed > 0).all()  # same BOX across every frame
    # erased BOX identical across frames (cube shares placement) but the
    # pixel noise redraws per frame (reference _erase_cube calls
    # _get_pixels inside the frame loop, random_erasing.py:159-168)
    mask = np.abs(out[0]).sum(-1) > 0
    noise_differs = False
    for t in range(1, 4):
        np.testing.assert_array_equal(np.abs(out[t]).sum(-1) > 0, mask)
        if not np.array_equal(out[t][mask], out[0][mask]):
            noise_differs = True
    assert noise_differs


# --- datasets ---------------------------------------------------------------


@pytest.fixture
def anno_file(tmp_path):
    lines = [f"/fake/video_{i}.mp4 {i % 3}" for i in range(6)]
    p = tmp_path / "train.csv"
    p.write_text("\n".join(lines))
    return str(p)


def test_cls_dataset_skip_strategy_sampling_rate(anno_file):
    """--sampling_rate > 0 on the sparse family switches EVERY mode to the
    reference's fixed-stride 'skip strategy' (kinetics_sparse.py:282 gates
    on skip_frames before the clip_idx branch — test views too)."""
    from unite_tpu.data.video_reader import SyntheticVideoReader

    for mode in ("train", "validation"):
        ds = VideoClsDatasetSparse(
            anno_file, mode=mode, clip_len=4, crop_size=64,
            short_side_size=80, reader=SyntheticVideoReader(96, 128),
            frame_sample_rate=3, seed=5)
        reader = ds.reader
        seen = []
        orig = reader.get_batch

        def spy(path, idx, _orig=orig):
            seen.append(list(idx))
            return _orig(path, idx)

        reader.get_batch = spy
        ds[0]
        assert seen, mode
        idx = seen[0]
        # fixed stride 3, contiguous window
        diffs = {b - a for a, b in zip(idx, idx[1:])}
        assert diffs == {3}, (mode, idx)


def test_pretrain_color_jitter_reference_semantics(anno_file):
    """The pretrain jitter passes the CONFIGURED strength through
    (reference build.py:41 GroupColorJitter(args.color_jitter)), applies
    no grayscale stage, and redraws per frame (transforms.py:114-116
    applies a fresh torchvision ColorJitter per img)."""
    from PIL import Image

    from unite_tpu.data.transforms import GroupColorJitter

    ds = VideoMAEPretrainDataset(
        anno_file, num_segments=2, skip_length=1, input_size=64,
        color_jitter=0.2, reader=None, seed=1)
    assert isinstance(ds.color_jitter, GroupColorJitter)
    assert ds.color_jitter.size == 0.2
    assert not hasattr(ds, "gray")

    rng = np.random.default_rng(0)
    base = np.full((32, 32, 3), 128, np.uint8)
    frames = [Image.fromarray(base) for _ in range(4)]
    out = GroupColorJitter(0.5)(frames, rng)
    arrs = [np.asarray(f).astype(np.int32) for f in out]
    # per-frame redraw: at least two frames got different factors
    assert any(not np.array_equal(arrs[0], a) for a in arrs[1:])
    # strength bounds: brightness-only change of a uniform gray image
    # stays within 1 +/- 0.5 of the base (contrast/saturation fix gray)
    for a in arrs:
        assert a.max() <= int(128 * 1.5) + 2 and a.min() >= 128 // 2 - 2


def test_cls_dataset_train(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=4, crop_size=64, short_side_size=80,
        reader=SyntheticVideoReader(96, 128), seed=0, reprob=0.25,
        aa="rand-m3-n2-mstd0.5-inc1",
    )
    assert len(ds) == 6
    clip, label, index, extra = ds[0]
    assert clip.shape == (4, 64, 64, 3)
    assert clip.dtype == np.float32
    assert label == 0
    # normalized space
    assert -4 < clip.mean() < 4


def test_cls_dataset_validation_and_aug_for_val(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="validation", clip_len=4, crop_size=64,
        short_side_size=80, reader=SyntheticVideoReader(96, 128),
        return_aug_for_val=True,
    )
    clip, aug, label, vid = ds[1]
    assert clip.shape == (4, 64, 64, 3)
    assert aug.shape == (4, 64, 64, 3)
    assert vid == "video_1"


def test_cls_dataset_test_views(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="test", clip_len=4, crop_size=64, short_side_size=64,
        test_num_segment=2, test_num_crop=3, reader=SyntheticVideoReader(96, 128),
    )
    assert len(ds) == 6 * 2 * 3
    clip, label, vid, chunk, crop = ds[0]
    assert clip.shape[0] == 4
    assert clip.shape[3] == 3
    assert (chunk, crop) == (0, 0)
    clip2, _, _, chunk2, crop2 = ds[6]  # after one full crop sweep of 6 samples
    assert (chunk2, crop2) == (0, 1)


def test_cls_dataset_retry_on_bad_video(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("/fake/ok.mp4 0\n/fake/bad.mp4 1")

    class FlakyReader(SyntheticVideoReader):
        def num_frames(self, path):
            if "bad" in path:
                raise RuntimeError("decode error")
            return super().num_frames(path)

    ds = VideoClsDatasetSparse(
        p.as_posix(), mode="train", clip_len=4, crop_size=64,
        short_side_size=80, reader=FlakyReader(96, 128), seed=0, aa="",
        reprob=0.0,
    )
    with pytest.warns(UserWarning):
        clip, label, _, _ = ds[1]  # bad video -> re-rolls to the good one
    assert clip.shape == (4, 64, 64, 3)


def test_pretrain_dataset(anno_file):
    from unite_tpu.ops.masking import TubeMaskingGenerator

    ds = VideoMAEPretrainDataset(
        anno_file, mask_gen=TubeMaskingGenerator((4, 4, 4), 0.75),
        num_segments=4, skip_length=1, new_step=1, input_size=64,
        reader=SyntheticVideoReader(96, 128), seed=0,
    )
    video, mask, label = ds[0]
    assert video.shape == (4, 64, 64, 3)
    assert mask.shape == (4 * 16,)
    assert mask.sum() == 4 * 12  # 75% of 16 per frame


def test_pretrain_dataset_attention_mode(anno_file):
    ds = VideoMAEPretrainDataset(
        anno_file, mask_gen=None, num_segments=4, skip_length=1, new_step=1,
        input_size=64, reader=SyntheticVideoReader(96, 128),
    )
    video, mask, label = ds[0]
    assert mask == -1  # device-side attention masking placeholder


# --- loader -----------------------------------------------------------------


def test_loader_batches_and_order(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=2, crop_size=32, short_side_size=48,
        reader=SyntheticVideoReader(64, 64), seed=0, aa="", reprob=0.0,
    )
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    clips, labels, idx, _ = batches[0]
    assert clips.shape == (4, 2, 32, 32, 3)
    assert labels.shape == (4,)
    # drop_last
    loader2 = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
    assert len(list(loader2)) == 1


def test_loader_process_workers_bitwise_equal_to_threads(anno_file):
    """Forked worker processes (the reference's DataLoader model) must
    reproduce thread-mode batches bitwise — incl. the per-(seed, epoch,
    index) augmentation RNG across set_epoch (workers fork AFTER
    set_epoch, inheriting the dataset state)."""
    def make(mode):
        ds = VideoClsDatasetSparse(
            anno_file, mode="train", clip_len=2, crop_size=32,
            short_side_size=48, reader=SyntheticVideoReader(64, 64),
            seed=0, aa="rand-m3-n2", reprob=0.25,
        )
        return DataLoader(ds, batch_size=3, num_workers=2, drop_last=False,
                          worker_mode=mode)

    lt, lp = make("thread"), make("process")
    for epoch in (0, 1):
        lt.set_epoch(epoch)
        lp.set_epoch(epoch)
        bt, bp = list(lt), list(lp)
        assert len(bt) == len(bp)
        for t, p in zip(bt, bp):
            np.testing.assert_array_equal(t[0], p[0])  # clips
            np.testing.assert_array_equal(t[1], p[1])  # labels


def test_loader_process_workers_propagate_errors(anno_file):
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("decode failed hard")
            return np.zeros((2, 2), np.float32), 0

    loader = DataLoader(Boom(), batch_size=4, num_workers=2,
                        worker_mode="process")
    with pytest.raises(RuntimeError, match="decode failed hard"):
        list(loader)


def test_loader_process_worker_death_raises_not_hangs(anno_file):
    """A worker killed mid-task (the segfault/OOM-kill analogue: os._exit)
    must surface as BrokenProcessPool instead of blocking .result()
    forever — multiprocessing.Pool replaces the dead worker but never
    completes its in-flight task, which is why the loader uses
    ProcessPoolExecutor."""
    import os as _os

    from concurrent.futures.process import BrokenProcessPool

    class Die:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                _os._exit(1)
            return np.zeros((2, 2), np.float32), 0

    loader = DataLoader(Die(), batch_size=4, num_workers=2,
                        worker_mode="process")
    with pytest.raises(BrokenProcessPool):
        list(loader)


def test_loader_rejects_unknown_worker_mode(anno_file):
    with pytest.raises(ValueError, match="worker_mode"):
        DataLoader([1, 2], batch_size=1, worker_mode="greenlet")


def test_loader_with_sharded_sampler(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=2, crop_size=32, short_side_size=48,
        reader=SyntheticVideoReader(64, 64), seed=0, aa="", reprob=0.0,
    )
    smp = ShardedSampler(len(ds), num_shards=2, shard_id=0, shuffle=True)
    loader = DataLoader(ds, batch_size=3, sampler=smp, num_workers=2)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == 3  # half the (padded) data


def test_cycle_wraps(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=2, crop_size=32, short_side_size=48,
        reader=SyntheticVideoReader(64, 64), seed=0, aa="", reprob=0.0,
    )
    loader = DataLoader(ds, batch_size=4, num_workers=1)
    it = cycle(loader)
    for _ in range(5):  # more than one epoch's worth of batches
        batch = next(it)
        assert batch[0].shape[0] in (2, 4)


def test_collate_num_sample_flatten():
    a = [(np.zeros((2, 2)), 1), (np.ones((2, 2)), 2)]
    items = [a, a]  # two dataset items, each num_sample=2 list of tuples
    clips, labels = default_collate(items)
    assert clips.shape == (4, 2, 2)
    assert labels.tolist() == [1, 2, 1, 2]


def test_num_sample_through_loader(anno_file):
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=2, crop_size=32, short_side_size=48,
        reader=SyntheticVideoReader(64, 64), seed=0, aa="", reprob=0.0,
        num_sample=2,
    )
    loader = DataLoader(ds, batch_size=3, num_workers=1, drop_last=True)
    clips, labels, idx, _ = next(iter(loader))
    # repeated-aug doubles the effective batch (reference num_sample semantics)
    assert clips.shape == (6, 2, 32, 32, 3)
    assert labels.shape == (6,)


def test_device_normalize_uint8_path_matches_fp32():
    """uint8 (device-normalize) pipeline ≈ host-normalized fp32 pipeline:
    same per-item RNG draws, output differs only by uint8 quantization."""
    import jax.numpy as jnp

    from unite_tpu.data.datasets import VideoClsDatasetSparse
    from unite_tpu.data.video_reader import SyntheticVideoReader
    from unite_tpu.ops.normalize import normalize_videos

    def make(dev_norm):
        import tempfile, os
        d = tempfile.mkdtemp()
        p = os.path.join(d, "a.csv")
        with open(p, "w") as f:
            for i in range(4):
                f.write(f"v{i}.mp4 {i % 2}\n")
        return VideoClsDatasetSparse(
            p, mode="validation", clip_len=2, crop_size=32,
            short_side_size=36, reader=SyntheticVideoReader(64, 80),
            seed=5, device_normalize=dev_norm)

    ds8 = make(True)
    dsf = make(False)
    clip8, label8, vid8 = ds8[1]
    clipf, labelf, vidf = dsf[1]
    assert clip8.dtype == np.uint8 and clipf.dtype == np.float32
    assert (label8, vid8) == (labelf, vidf)
    dev = np.asarray(normalize_videos(jnp.asarray(clip8[None]),
                                      dtype=jnp.float32))[0]
    assert np.max(np.abs(dev - clipf)) < 0.05  # quantization only

    # train mode: same rng stream in both modes -> same crops/augs drawn
    tr8 = make(True); tr8.mode = "train"
    trf = make(False); trf.mode = "train"
    c8, l8, i8, _ = tr8[2]
    cf, lf, if_, _ = trf[2]
    assert c8.dtype == np.uint8 and cf.dtype == np.float32
    assert c8.shape == cf.shape
    dev = np.asarray(normalize_videos(jnp.asarray(c8[None]),
                                      dtype=jnp.float32))[0]
    # erasing noise + interpolation rounding: compare medians loosely
    assert np.median(np.abs(dev - cf)) < 0.05


def test_dense_segment_indices_reference_parity():
    """Pinned against kinetics.py:281-320 arithmetic (literals generated by
    executing the reference formulas for fixed seeds/video lengths)."""
    from unite_tpu.data.samplers import dense_segment_indices as dsi

    # test mode: evenly-spaced window starts, stride 2, repeat-padded
    assert [dsi(100, 8, 2, "test", c) for c in range(5)] == [
        [0, 2, 4, 6, 8, 10, 12, 14], [21, 23, 25, 27, 29, 31, 33, 35],
        [42, 44, 46, 48, 50, 52, 54, 56], [63, 65, 67, 69, 71, 73, 75, 77],
        [84, 86, 88, 90, 92, 94, 96, 98]]
    # short video: same indices for every chunk, padded with the last frame
    assert dsi(10, 8, 2, "test", 2) == [0, 2, 4, 6, 8, 8, 8, 8]
    # validation: deterministic early-ish window (ref's exact (s-c)//2 end)
    assert dsi(100, 8, 2, "validation") == [26, 28, 30, 32, 35, 37, 39, 41]
    # short-video train/val: linspace(0, seg) padded + clipped
    assert dsi(12, 8, 2, "validation") == [0, 2, 4, 7, 9, 11, 11, 11]
    # train: randint(converted, seg_len) end, linspace window (seed 0)
    got = dsi(50, 8, 2, "train", rng=np.random.default_rng(0))
    assert got == [28, 30, 32, 34, 37, 39, 41, 43]


def test_ssv2_segment_indices_reference_parity():
    """Pinned against ssv2.py:580-607 arithmetic."""
    from unite_tpu.data.samplers import ssv2_segment_indices as ssi

    # test: sorted centers + starts (two interleaved temporal views)
    assert ssi(41, 8, "test") == [0, 2, 5, 7, 10, 12, 15, 17, 20, 23, 25,
                                  28, 30, 33, 35, 38]
    # validation: segment centers int(tick/2 + tick*x)
    assert ssi(41, 8, "validation") == [2, 7, 12, 17, 23, 28, 33, 38]
    assert ssi(5, 8, "validation") == [0, 0, 1, 2, 2, 3, 4, 4]
    # train: arange(T)*avg + randint(avg) (seed 0)
    got = ssi(41, 8, "train", rng=np.random.default_rng(0))
    assert got == [4, 8, 12, 16, 21, 25, 30, 35]
    # degenerate: video shorter than T
    assert ssi(4, 8, "train", rng=np.random.default_rng(0)) == [0] * 8


def test_ssv2_video_dataset_test_protocol(tmp_path):
    """SSVideoClsDataset: 2 temporal views x crops, [chunk::2] slicing,
    short_side test windows (ssv2.py:406-486)."""
    from unite_tpu.data.datasets_extra import SSVideoClsDataset
    from unite_tpu.data.video_reader import SyntheticVideoReader

    p = tmp_path / "a.csv"
    p.write_text("".join(f"v{i}.mp4 {i % 3}\n" for i in range(4)))
    ds = SSVideoClsDataset(
        str(p), num_segment=4, mode="test", clip_len=1, crop_size=32,
        short_side_size=32, test_num_crop=3,
        reader=SyntheticVideoReader(48, 64, frames=40), seed=0)
    assert len(ds) == 2 * 3 * 4  # 2 temporal x 3 spatial x 4 videos
    clip, label, vid, chunk_nb, split_nb = ds[0]
    assert clip.shape == (4, 32, 32, 3)  # num_segment frames after [0::2]
    assert chunk_nb in (0, 1) and split_nb in (0, 1, 2)

    ds_tr = SSVideoClsDataset(
        str(p), num_segment=4, mode="train", clip_len=1, crop_size=32,
        short_side_size=32, aa="", reprob=0.0,
        reader=SyntheticVideoReader(48, 64, frames=40), seed=0)
    clip, label, idx, _ = ds_tr[1]
    assert clip.shape == (4, 32, 32, 3)


def test_build_dataset_nb_classes_mismatch_raises(anno_file):
    """Fixed-class datasets must match --nb_classes (reference build.py:254
    asserts); Kinetics-family takes the count FROM args (Daily-DA subsets)."""
    from types import SimpleNamespace

    from unite_tpu.data.build import build_dataset

    args = SimpleNamespace(data_set="UCF101", nb_classes=12, num_frames=4,
                           input_size=64, data_path=anno_file)
    with pytest.raises(ValueError, match="nb_classes"):
        build_dataset("train", args, anno_path=anno_file,
                      reader=SyntheticVideoReader(96, 128))
    # Kinetics_sparse: args wins, no raise
    args = SimpleNamespace(data_set="Kinetics_sparse", nb_classes=12,
                           num_frames=4, input_size=64, data_path=anno_file)
    ds, nb = build_dataset("train", args, anno_path=anno_file,
                           reader=SyntheticVideoReader(96, 128))
    assert nb == 12


def test_train_interpolation_fixed_bicubic(anno_file, monkeypatch):
    """--train_interpolation reaches rand-augment as a FIXED PIL filter
    (reference kinetics_sparse.py:225 -> video_transforms.py:667-668);
    'random' keeps timm's per-op (BILINEAR, BICUBIC) tuple."""
    from PIL import Image

    import unite_tpu.data.datasets as dmod

    captured = {}
    real = dmod.rand_augment_transform

    def spy(cfg, hparams):
        captured["interpolation"] = hparams["interpolation"]
        return real(cfg, hparams)

    monkeypatch.setattr(dmod, "rand_augment_transform", spy)
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=2, crop_size=64, short_side_size=80,
        reader=SyntheticVideoReader(96, 128), seed=0, reprob=0.0,
        aa="rand-m3-n2", train_interpolation="bicubic",
    )
    ds[0]
    assert captured["interpolation"] == Image.BICUBIC
    ds = VideoClsDatasetSparse(
        anno_file, mode="train", clip_len=2, crop_size=64, short_side_size=80,
        reader=SyntheticVideoReader(96, 128), seed=0, reprob=0.0,
        aa="rand-m3-n2", train_interpolation="random",
    )
    ds[0]
    assert captured["interpolation"] == (Image.BILINEAR, Image.BICUBIC)


def test_loader_thread_window_covers_workers(anno_file):
    """Thread mode must keep >= num_workers batch decodes in flight
    (prefetch_batches=4 used to cap concurrency below the worker count)."""
    import threading
    import time

    from unite_tpu.data.loader import DataLoader

    peak = [0]
    active = [0]
    lock = threading.Lock()

    class SlowDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                active[0] += 1
                peak[0] = max(peak[0], active[0])
            time.sleep(0.05)
            with lock:
                active[0] -= 1
            return np.zeros(2, np.float32), i

    loader = DataLoader(SlowDataset(), batch_size=1, num_workers=8,
                        prefetch_batches=2)
    for _ in loader:
        pass
    assert peak[0] >= 6, peak  # ~8 minus scheduling slack
    # prefetch_batches=0 must not crash (guarded to >=1)
    loader = DataLoader(SlowDataset(), batch_size=32, num_workers=2,
                        prefetch_batches=0)
    assert len(list(loader)) == 2


def test_device_prefetch_abandoned_consumer_unblocks_producer():
    """Abandoning the generator (preemption break / bench loop) must stop
    the producer thread instead of leaving it blocked in q.put forever."""
    import threading
    import time

    from unite_tpu.data.loader import device_prefetch

    produced = []

    def source():
        for i in range(100):
            produced.append(i)
            yield i

    n_before = threading.active_count()
    gen = device_prefetch(source(), lambda x: x, depth=2)
    assert next(gen) == 0
    gen.close()  # consumer abandons mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before
    assert len(produced) < 100  # producer stopped early


def test_mixup_requires_an_active_alpha():
    from unite_tpu.ops.mixup import Mixup

    with pytest.raises(ValueError, match="mixup_alpha"):
        Mixup(mixup_alpha=0.0, cutmix_alpha=0.0, num_classes=4)


def test_loader_worker_death_with_parent_sigterm_handler(anno_file):
    """Regression (r4): entries leave a catching SIGTERM handler installed
    while they run (PreemptionGuard); forked loader workers used to inherit
    it, so the executor's terminate() was swallowed and a worker-death
    shutdown joined an unkillable idle worker forever — wedging the whole
    process. Workers now reset SIGTERM to default at init; this drives the
    death path under an installed handler and must complete, not hang."""
    import os as _os
    import signal
    import threading

    from concurrent.futures.process import BrokenProcessPool

    class Die:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                _os._exit(1)
            return np.zeros((2, 2), np.float32), 0

    prev = signal.signal(signal.SIGTERM, lambda s, f: None)
    done = []
    try:
        def drive():
            loader = DataLoader(Die(), batch_size=4, num_workers=2,
                                worker_mode="process")
            try:
                list(loader)
            except BrokenProcessPool:
                done.append(True)

        t = threading.Thread(target=drive, daemon=True)
        t.start()
        t.join(120)
        assert done == [True], \
            "loader hung (or didn't raise) after worker death with a " \
            "parent SIGTERM handler installed"
    finally:
        signal.signal(signal.SIGTERM, prev)
