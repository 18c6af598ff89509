"""Video decode backends: native C++ (FFmpeg), OpenCV fallback, synthetic.

The decord replacement (SURVEY §2.2): training needs indexed frame-batch
reads (``get_batch(path, indices)``). Backends:

* ``NativeVideoReader`` — ctypes binding to the first-party C++ decoder
  (unite_tpu/native/videodec.cpp → libunite_videodec.so), FFmpeg-based like
  decord, supporting random access by frame index;
* ``CV2VideoReader``   — OpenCV VideoCapture fallback (sequential seek);
* ``SyntheticVideoReader`` — deterministic procedurally-generated frames
  keyed by (path, index), for tests and benchmarks without video files.

All return uint8 [N, H, W, C] RGB.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_LIB_NAMES = (
    os.path.join(os.path.dirname(__file__), "..", "native", "libunite_videodec.so"),
    "libunite_videodec.so",
)


class VideoReaderBase:
    # every dataset item calls num_frames(path) then get_batch(path, idx):
    # without a memo that is TWO container opens + stream probes per item
    # per epoch (decord keeps one open VideoReader instead). Frame count
    # is immutable for a training run and independent of decode scaling,
    # so the base class memoizes it per path (bounded; cleared at cap).
    _NFRAMES_CAP = 100_000

    def num_frames(self, path: str) -> int:
        cache = self.__dict__.setdefault("_nframes_cache", {})
        n = cache.get(path)
        if n is None:
            n = self._probe_num_frames(path)
            if len(cache) >= self._NFRAMES_CAP:
                cache.clear()
            cache[path] = n
        return n

    def _probe_num_frames(self, path: str) -> int:
        raise NotImplementedError

    def get_batch(self, path: str, indices: Sequence[int]) -> np.ndarray:
        raise NotImplementedError


class NativeVideoReader(VideoReaderBase):
    """ctypes wrapper over the C++ FFmpeg decoder.

    C ABI (native/videodec.cpp):
      void* vd_open(const char* path);
      void* vd_open_scaled(const char* path, int short_side);
      int   vd_num_frames(void* h);
      int   vd_width(void* h); int vd_height(void* h);
      int   vd_get_batch(void* h, const int64_t* idx, int n, uint8_t* out);
      void  vd_close(void* h);

    ``short_side``: decode-time bilinear resize so frames arrive with the
    short side already at the eval protocol's size — the swscale pass that
    converts pix_fmt to RGB24 does the scaling for free, and the host
    pipeline skips its cv2 resize (--device_eval_transforms input path).
    ``size``: exact (width, height) decode — decord's
    ``VideoReader(width=, height=)`` aspect-squashing semantics, the
    dataset ``keep_aspect_ratio=False`` branch (kinetics_sparse.py:337).
    """

    _lib = None

    def __init__(self, short_side: Optional[int] = None,
                 size: Optional[tuple] = None):
        self.short_side = short_side
        self.size = size

    @classmethod
    def load_library(cls):
        if cls._lib is not None:
            return cls._lib
        last_err = None
        for name in _NATIVE_LIB_NAMES:
            try:
                lib = ctypes.CDLL(name)
                lib.vd_open.restype = ctypes.c_void_p
                lib.vd_open.argtypes = [ctypes.c_char_p]
                lib.vd_open_scaled.restype = ctypes.c_void_p
                lib.vd_open_scaled.argtypes = [ctypes.c_char_p, ctypes.c_int]
                lib.vd_open_sized.restype = ctypes.c_void_p
                lib.vd_open_sized.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
                lib.vd_num_frames.restype = ctypes.c_int
                lib.vd_num_frames.argtypes = [ctypes.c_void_p]
                lib.vd_width.restype = ctypes.c_int
                lib.vd_width.argtypes = [ctypes.c_void_p]
                lib.vd_height.restype = ctypes.c_int
                lib.vd_height.argtypes = [ctypes.c_void_p]
                lib.vd_get_batch.restype = ctypes.c_int
                lib.vd_get_batch.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ]
                lib.vd_close.restype = None
                lib.vd_close.argtypes = [ctypes.c_void_p]
                cls._lib = lib
                return lib
            except OSError as e:  # pragma: no cover - env dependent
                last_err = e
        raise ImportError(f"native video decoder not available: {last_err}")

    @classmethod
    def available(cls) -> bool:
        try:
            cls.load_library()
            return True
        except ImportError:
            return False

    def _open(self, path: str):
        lib = self.load_library()
        if getattr(self, "size", None):
            w, h = self.size
            handle = lib.vd_open_sized(path.encode(), int(w), int(h))
        elif getattr(self, "short_side", None):
            handle = lib.vd_open_scaled(path.encode(), int(self.short_side))
        else:
            handle = lib.vd_open(path.encode())
        if not handle:
            raise FileNotFoundError(f"cannot open video: {path}")
        return lib, handle

    def _probe_num_frames(self, path: str) -> int:
        lib, h = self._open(path)
        try:
            return int(lib.vd_num_frames(h))
        finally:
            lib.vd_close(h)

    def get_batch(self, path: str, indices: Sequence[int]) -> np.ndarray:
        lib, h = self._open(path)
        try:
            w, hh = int(lib.vd_width(h)), int(lib.vd_height(h))
            idx = np.asarray(indices, np.int64)
            out = np.empty((len(idx), hh, w, 3), np.uint8)
            rc = lib.vd_get_batch(
                h,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc != 0:
                raise RuntimeError(f"decode failed ({rc}): {path}")
            return out
        finally:
            lib.vd_close(h)


class CV2VideoReader(VideoReaderBase):
    """OpenCV fallback; ``short_side``/``size`` resize after decode
    (host-side — no decode-time scaling in VideoCapture), keeping the
    reader contract."""

    def __init__(self, short_side: Optional[int] = None,
                 size: Optional[tuple] = None):
        self.short_side = short_side
        self.size = size

    def _probe_num_frames(self, path: str) -> int:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise FileNotFoundError(f"cannot open video: {path}")
            return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        finally:
            cap.release()

    def get_batch(self, path: str, indices: Sequence[int]) -> np.ndarray:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise FileNotFoundError(f"cannot open video: {path}")
            frames = {}
            want = sorted(set(int(i) for i in indices))
            pos = 0
            for target in want:
                if target != pos:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, target)
                    pos = target
                ok, frame = cap.read()
                pos += 1
                if not ok:
                    raise RuntimeError(f"decode failed at frame {target}: {path}")
                frames[target] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            out = np.stack([frames[int(i)] for i in indices])
            if getattr(self, "size", None):
                from unite_tpu.data.transforms import resize_clip

                w, h = self.size
                out = resize_clip(out, (int(h), int(w)))
            elif getattr(self, "short_side", None):
                from unite_tpu.data.transforms import resize_clip

                out = resize_clip(out, int(self.short_side))
            return out
        finally:
            cap.release()


class SyntheticVideoReader(VideoReaderBase):
    """Deterministic fake videos: shape/content derived from the path hash."""

    def __init__(self, height: int = 128, width: int = 160,
                 frames: Optional[int] = None):
        self.height = height
        self.width = width
        self.frames = frames

    def _seed(self, path: str) -> int:
        return int(hashlib.md5(path.encode()).hexdigest()[:8], 16)

    def num_frames(self, path: str) -> int:
        if self.frames is not None:
            return self.frames
        return 40 + self._seed(path) % 80

    def get_batch(self, path: str, indices: Sequence[int]) -> np.ndarray:
        # the content formula (yy*base + xx*(255-base) + 7i) mod 256 is
        # separable: precompute per-row and per-column byte patterns, then
        # broadcast-add in uint8 — native wraparound IS the mod 256, so the
        # hot loop is two uint8 adds per element (bitwise-identical to the
        # naive int64 formula)
        seed = self._seed(path)
        idx = np.asarray(list(indices), np.int64)
        base = np.stack([
            np.random.default_rng(seed + int(i)).integers(0, 255, size=3)
            for i in idx
        ])  # [N, 3]
        yy = np.arange(self.height, dtype=np.int64)
        xx = np.arange(self.width, dtype=np.int64)
        row = ((yy[None, :, None] * base[:, None, :]) % 256).astype(np.uint8)
        col = ((xx[None, :, None] * (255 - base)[:, None, :]) % 256).astype(
            np.uint8)
        off = ((idx * 7) % 256).astype(np.uint8)
        out = row[:, :, None, :] + col[:, None, :, :]  # uint8 wrap = mod 256
        out += off[:, None, None, None]
        return out


def default_reader(short_side: Optional[int] = None) -> VideoReaderBase:
    if NativeVideoReader.available():
        return NativeVideoReader(short_side=short_side)
    return CV2VideoReader(short_side=short_side)
