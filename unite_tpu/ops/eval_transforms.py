"""Device-side eval transforms: resize + center-crop + normalize in XLA.

The reference's val pipeline (kinetics_sparse.py:101-108) runs
Resize(short side) → CenterCrop → Normalize per clip on the host. With
``--device_eval_transforms`` the host ships RAW decoded uint8 frames and
the whole chain runs fused inside the jitted eval step:

* host→device traffic stays uint8 (and is the *decoded* raster, so no
  host cv2 resize at all — the one remaining host cost is the decode);
* the resize is one XLA ``jax.image.resize`` (bilinear, half-pixel
  centers — the same convention as cv2.INTER_LINEAR, so outputs agree to
  interpolation rounding, ≤1e-2 after normalize);
* crop + /255 + mean/std fuse into the first conv's input epilogue.

Static-shape contract: XLA needs one (H, W) per compiled program, so this
path targets fixed-resolution sources (a decoder opened with
``short_side=`` — see NativeVideoReader — or datasets with uniform raster
like ARID/Synthetic). Mixed-resolution datasets keep the host path; the
dataset raises a clear error at collate if shapes diverge.

The test-protocol crop grid (kinetics_sparse.py:186-208) intentionally
stays host-side even under this flag: its crops are pure uint8 slices of
the short-side-resized buffer (zero host FLOPs once the decoder scales),
and shipping the full long-side canvas to crop on device would *increase*
H2D bytes by the aspect ratio. The flag therefore moves the resize via
the decoder (NativeVideoReader short_side) for test mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unite_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def resize_short_side(videos, short_side: int, method: str = "linear"):
    """[..., H, W, 3] → short side == ``short_side``, aspect preserved
    (rounding matches data/transforms.py::resize_clip: int(size*long/short)).

    No-op (returns the input) when the short side already matches — the
    decoder-scaled path lands here and skips the resize entirely.
    """
    h, w = videos.shape[-3], videos.shape[-2]
    if w < h:
        ow, oh = short_side, int(short_side * h / w)
    else:
        ow, oh = int(short_side * w / h), short_side
    if (oh, ow) == (h, w):
        return videos
    shape = videos.shape[:-3] + (oh, ow, videos.shape[-1])
    # antialias=False: cv2.INTER_LINEAR samples a plain 2x2 neighborhood at
    # half-pixel centers with no downscale prefilter — match it exactly
    # (host/device parity) rather than being "better"
    return jax.image.resize(videos.astype(jnp.float32), shape, method=method,
                            antialias=False)


def torch_bicubic_weights(src: int, dst: int, a: float = -0.75):
    """[dst, src] separable resize matrix matching torch's
    ``F.interpolate(mode='bicubic', align_corners=False)`` exactly
    (half-pixel centers, 4 border-clamped taps, Keys cubic a=-0.75 —
    jax.image.resize uses a=-0.5 plus antialiasing and deviates by ~1.0 on
    N(0,1) frames at 224→196; this matrix reproduces torch to fp32
    rounding, verified ≤1e-4)."""
    import numpy as np

    scale = src / dst
    w = np.zeros((dst, src), np.float64)

    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        f = int(np.floor(center))
        frac = center - f
        for m in (-1, 0, 1, 2):
            w[i, min(max(f + m, 0), src - 1)] += k(m - frac)
    return w.astype(np.float32)


def bicubic_resize_square(videos, out_size: int):
    """[..., H, H, C] → [..., out, out, C] with torch-bicubic parity
    (the reference's teacher resize, run_stage1.py:365-373). Two batched
    matmuls against the precomputed weight matrix — MXU-friendly and
    exact where jax.image.resize('bicubic') is not."""
    h = videos.shape[-3]
    if h == out_size:
        return videos
    w = jnp.asarray(torch_bicubic_weights(h, out_size))
    x = videos.astype(jnp.float32)
    x = jnp.einsum("os,...swc->...owc", w, x)
    x = jnp.einsum("pw,...owc->...opc", w, x)
    return x.astype(videos.dtype)


def center_crop(videos, crop_size: int):
    """Center ``crop_size`` square, same offset math as the host path
    (transforms.py::uniform_crop idx=1: ceil((dim-size)/2))."""
    h, w = videos.shape[-3], videos.shape[-2]
    y = -(-(h - crop_size) // 2)  # ceil
    x = -(-(w - crop_size) // 2)
    return videos[..., y:y + crop_size, x:x + crop_size, :]


def device_val_transform(videos, short_side: int, crop_size: int,
                         dtype=jnp.bfloat16):
    """uint8 [..., H, W, 3] decoded frames → normalized [..., C, C, 3].

    The exact val protocol (resize short side → center crop → /255 →
    ImageNet mean/std), all on device. Float inputs are assumed already
    normalized+cropped (passthrough, mirrors ops/normalize.py).
    """
    if videos.dtype != jnp.uint8:
        return videos.astype(dtype)
    if videos.shape[-3] == videos.shape[-2] == crop_size:
        # already at the model raster: host-cropped TRAIN clips fed to the
        # kNN gallery, or test views with short_side == input_size. This
        # shape cannot be a raw val/test decode needing the magnify+crop
        # protocol: --device_eval_transforms decodes val/test at
        # decode-time short-side scaling (reader_for(for_eval=True)), so
        # raw eval rasters always arrive with short side == short_side
        # (and _check_canvas enforces one raster per run) — a crop_size-
        # square input here is by construction already transformed
        x = videos.astype(jnp.float32)
    else:
        x = resize_short_side(videos, short_side).astype(jnp.float32)
        x = center_crop(x, crop_size)
    x = x / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x.astype(dtype)


def make_device_val_transform(short_side: int, crop_size: int,
                              dtype=jnp.bfloat16):
    """Partial for engines: batch["videos"] → model input."""
    def fn(videos):
        return device_val_transform(videos, short_side, crop_size, dtype)
    return fn
