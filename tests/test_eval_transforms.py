"""Device-side eval transform parity (--device_eval_transforms path).

VERDICT r3 item 7: resize + center-crop + normalize fused on-device must
match the host pipeline (kinetics_sparse.py:101-108 protocol) within bf16
interpolation tolerance, and exactly where no interpolation is involved.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unite_tpu.data import transforms as T
from unite_tpu.data.datasets import VideoClsDatasetSparse
from unite_tpu.data.video_reader import SyntheticVideoReader
from unite_tpu.ops.eval_transforms import (
    center_crop,
    device_val_transform,
    make_device_val_transform,
    resize_short_side,
)


def _clip(t=2, h=256, w=320, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(t, h, w, 3)).astype(np.uint8)


def _host(clip, s, c):
    return T.val_transform(clip, s, c, normalize=True).astype(np.float32)


def test_crop_normalize_exact_when_preresized():
    """Short side already at S: the device path is crop+normalize only —
    bitwise-equal (up to fp32 assoc) to the host path."""
    clip = _clip()
    got = np.asarray(device_val_transform(
        jnp.asarray(clip), 256, 224, dtype=jnp.float32))
    np.testing.assert_allclose(got, _host(clip, 256, 224), rtol=0, atol=1e-6)


def test_resize_path_close_to_cv2():
    """Device resize (jax.image bilinear, half-pixel centers) vs host cv2
    INTER_LINEAR: same convention, small interpolation deltas only."""
    clip = _clip(h=300, w=400, seed=1)
    got = np.asarray(device_val_transform(
        jnp.asarray(clip), 256, 224, dtype=jnp.float32))
    want = _host(clip, 256, 224)
    assert got.shape == want.shape == (2, 224, 224, 3)
    # normalized units; 1e-2 ~ 0.6 uint8 LSB of interp rounding
    assert np.abs(got - want).mean() < 2e-2
    assert np.quantile(np.abs(got - want), 0.99) < 2e-1


def test_resize_short_side_noop_and_rounding():
    x = jnp.zeros((2, 256, 320, 3), jnp.uint8)
    assert resize_short_side(x, 256) is x  # no-op: short side matches
    y = resize_short_side(jnp.zeros((1, 300, 400, 3), jnp.uint8), 256)
    # rounding matches transforms.resize_clip: int(256*400/300) = 341
    assert y.shape == (1, 256, 341, 3)


def test_center_crop_offset_matches_host():
    clip = _clip(h=256, w=341, seed=2)
    got = np.asarray(center_crop(jnp.asarray(clip), 224))
    want = T.center_crop(clip, 224)
    np.testing.assert_array_equal(got, want)


def test_crop_size_bypass_for_cropped_inputs():
    """224x224 inputs (kNN gallery train crops; test views at S=224) skip
    the resize+crop round trip entirely — pure normalize."""
    clip = _clip(h=224, w=224, seed=3)
    got = np.asarray(device_val_transform(
        jnp.asarray(clip), 256, 224, dtype=jnp.float32))
    np.testing.assert_allclose(
        got, T.tensor_normalize(clip).astype(np.float32), rtol=0, atol=1e-6)


def test_bf16_default_dtype():
    fn = make_device_val_transform(256, 224)
    out = fn(jnp.asarray(_clip()))
    assert out.dtype == jnp.bfloat16
    assert out.shape == (2, 224, 224, 3)


# ---------------------------------------------------------------------------
# Dataset integration: canvas slicing + composition parity
# ---------------------------------------------------------------------------


def _make_ds(tmp_path, n=4, mode="validation", reader=None, **kw):
    anno = tmp_path / "val.csv"
    anno.write_text("".join(f"v{i:03d}.mp4 {i % 3}\n" for i in range(n)))
    return VideoClsDatasetSparse(
        anno_path=str(anno), mode=mode, clip_len=2, crop_size=224,
        short_side_size=256, seed=0,
        reader=reader or SyntheticVideoReader(256, 320),
        **kw,
    )


def test_val_canvas_composes_to_host_protocol(tmp_path):
    """Decoder-scaled path: host slices an SxS canvas with the corrected
    offset; device center-crop of that canvas must equal the host
    val_transform EXACTLY (both are crops of the same resized buffer)."""
    ds_host = _make_ds(tmp_path)
    ds_dev = _make_ds(tmp_path, device_eval_transforms=True)
    for i in range(len(ds_dev)):
        canvas, label_d, vid_d = ds_dev[i]
        assert canvas.dtype == np.uint8 and canvas.shape == (2, 256, 256, 3)
        got = np.asarray(device_val_transform(
            jnp.asarray(canvas), 256, 224, dtype=jnp.float32))
        clip_h, label_h, vid_h = ds_host[i]
        np.testing.assert_allclose(got, clip_h, rtol=0, atol=1e-6)
        assert (label_d, vid_d) == (label_h, vid_h)


def test_val_canvas_mismatch_raises(tmp_path):
    class TwoSizeReader(SyntheticVideoReader):
        def get_batch(self, path, indices):
            if path.endswith("v001.mp4"):
                self.height, self.width = 240, 352
            else:
                self.height, self.width = 256, 320
            return super().get_batch(path, indices)

    ds = _make_ds(tmp_path, reader=TwoSizeReader(),
                  device_eval_transforms=True)
    ds[0]
    with pytest.raises(RuntimeError, match="fixed decode raster"):
        ds[1]


def test_test_mode_skips_resize_when_decoder_scaled(tmp_path):
    """Test protocol with a short-side-matching reader: crops are pure
    uint8 slices, identical to the host-resize path (resize at scale 1 is
    the identity for cv2 INTER_LINEAR)."""
    ds_host = _make_ds(tmp_path, mode="test",
                       reader=SyntheticVideoReader(256, 320),
                       device_normalize=True,
                       test_num_segment=1, test_num_crop=3)
    ds_dev = _make_ds(tmp_path, mode="test",
                      reader=SyntheticVideoReader(256, 320),
                      device_eval_transforms=True,
                      test_num_segment=1, test_num_crop=3)
    for i in range(len(ds_dev)):
        clip_d, label_d, vid_d, ck_d, cp_d = ds_dev[i]
        clip_h, label_h, vid_h, ck_h, cp_h = ds_host[i]
        assert clip_d.dtype == np.uint8
        np.testing.assert_array_equal(clip_d, clip_h)
        assert (label_d, vid_d, ck_d, cp_d) == (label_h, vid_h, ck_h, cp_h)


def test_eval_step_end_to_end_parity(tmp_path):
    """make_eval_step(input_transform=...) on canvases == host-path eval
    on the same videos (logits parity through a real ViT)."""
    import jax

    from unite_tpu.engines.finetune import make_eval_step
    from unite_tpu.models.vit import VisionTransformer
    from unite_tpu.train.train_state import TrainState
    import optax

    ds_host = _make_ds(tmp_path, n=2)
    ds_dev = _make_ds(tmp_path, n=2, device_eval_transforms=True)
    host = np.stack([ds_host[i][0] for i in range(2)])
    dev = np.stack([ds_dev[i][0] for i in range(2)])
    labels = np.asarray([ds_host[i][1] for i in range(2)], np.int32)

    model = VisionTransformer(
        img_size=224, patch_size=16, num_classes=3, embed_dim=64, depth=2,
        num_heads=2, all_frames=2, tubelet_size=1, use_mean_pooling=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 224, 224, 3)))["params"]
    state = TrainState.create(params, optax.identity())

    from unite_tpu.ops.eval_transforms import make_device_val_transform

    step_host = make_eval_step(model)
    step_dev = make_eval_step(
        model, input_transform=make_device_val_transform(
            256, 224, dtype=jnp.float32))
    out_h = step_host(state, {"videos": jnp.asarray(host),
                              "labels": jnp.asarray(labels)})
    out_d = step_dev(state, {"videos": jnp.asarray(dev),
                             "labels": jnp.asarray(labels)})
    np.testing.assert_allclose(np.asarray(out_d["probs"]),
                               np.asarray(out_h["probs"]),
                               rtol=1e-4, atol=1e-5)


def test_val_canvas_dense_family_inherits_device_path(tmp_path):
    """VideoClsDatasetDense subclasses the Sparse item paths, so the device
    eval transform contract holds for the dense dispatch too."""
    from unite_tpu.data.datasets_extra import VideoClsDatasetDense

    anno = tmp_path / "vald.csv"
    anno.write_text("".join(f"v{i:03d}.mp4 {i % 3}\n" for i in range(3)))
    common = dict(anno_path=str(anno), mode="validation", clip_len=2,
                  crop_size=224, short_side_size=256, seed=0,
                  frame_sample_rate=2,
                  reader=SyntheticVideoReader(256, 320, frames=64))
    ds_host = VideoClsDatasetDense(**common)
    ds_dev = VideoClsDatasetDense(**common, device_eval_transforms=True)
    canvas, label, vid = ds_dev[0]
    assert canvas.dtype == np.uint8 and canvas.shape == (2, 256, 256, 3)
    got = np.asarray(device_val_transform(
        jnp.asarray(canvas), 256, 224, dtype=jnp.float32))
    np.testing.assert_allclose(got, ds_host[0][0], rtol=0, atol=1e-6)


def test_aug_stream_uses_full_raster_under_device_path(tmp_path):
    """return_aug_for_val + device_eval_transforms: the stage-3 aug stream
    must be built from the FULL decoded raster, not the SxS canvas slice
    (ADVICE r4) — pinned bitwise against the host path's aug output."""
    ds_host = _make_ds(tmp_path, device_normalize=True,
                       return_aug_for_val=True)
    ds_dev = _make_ds(tmp_path, device_eval_transforms=True,
                      return_aug_for_val=True)
    for i in range(len(ds_dev)):
        _, aug_h, label_h, vid_h = ds_host[i]
        _, aug_d, label_d, vid_d = ds_dev[i]
        assert (label_d, vid_d) == (label_h, vid_h)
        np.testing.assert_array_equal(aug_d, aug_h)


def test_bicubic_resize_matches_torch():
    """Teacher resize parity (run_stage1.py:365-373): torch F.interpolate
    bicubic (a=-0.75, align_corners=False, no antialias) vs our separable
    weight-matrix resize — jax.image.resize('bicubic') deviates by ~1.0 on
    N(0,1) frames at 224→196 (antialias + a=-0.5), which shifted the
    frozen teacher's inputs off the reference (ADVICE r4)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from unite_tpu.ops.eval_transforms import bicubic_resize_square

    rng = np.random.default_rng(0)
    for s, d in ((224, 196), (196, 224), (64, 48)):
        x = rng.standard_normal((2, 2, s, s, 3)).astype(np.float32)
        got = np.asarray(bicubic_resize_square(jnp.asarray(x), d))
        ref = F.interpolate(
            torch.tensor(x).permute(0, 1, 4, 2, 3).reshape(-1, 3, s, s),
            size=(d, d), mode="bicubic", align_corners=False,
        ).reshape(2, 2, 3, d, d).permute(0, 1, 3, 4, 2).numpy()
        np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
