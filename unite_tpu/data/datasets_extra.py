"""Additional dataset families: dense-sampling classification + SSV2 raw frames.

Counterparts of /root/reference/src/datasets/kinetics.py:46-330
(`VideoClsDataset`, dense ``frame_sample_rate`` sampling with the
(chunk, crop) test grid) and ssv2.py:46-341 (`SSRawFrameClsDataset`,
frame-folder datasets with ``img_%05d.jpg`` naming; annotation lines carry
an explicit frame count). Augmentation stacks are shared with
data/datasets.py (kinetics.py's _aug_frame matches kinetics_sparse.py's).
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Tuple

import numpy as np

from unite_tpu.data import transforms as T
from unite_tpu.data.datasets import (
    MAX_DECODE_RETRIES,
    VideoClsDatasetSparse,
    load_annotations,
)
from unite_tpu.data.samplers import dense_frame_indices
from unite_tpu.data.video_reader import VideoReaderBase


class VideoClsDatasetDense(VideoClsDatasetSparse):
    """Dense fixed-stride sampling (kinetics.py): clip_len frames at
    frame_sample_rate; test chunks are evenly-spaced window starts."""

    def __init__(self, *args, frame_sample_rate: int = 2, **kwargs):
        self.frame_sample_rate = frame_sample_rate
        super().__init__(*args, **kwargs)

    def _load_clip(self, path: str, chunk_nb: int,
                   rng: np.random.Generator) -> np.ndarray:
        n = self.reader.num_frames(path)
        if n <= 0:
            raise RuntimeError(f"empty video {path}")
        span = self.clip_len * self.frame_sample_rate
        if chunk_nb == -1:  # train: random window
            idx = dense_frame_indices(n, self.clip_len, self.frame_sample_rate,
                                      rng=rng)
        else:
            nseg = self.test_num_segment if self.mode == "test" else 1
            max_start = max(0, n - span)
            start = (max_start * chunk_nb) // max(1, nseg - 1) if nseg > 1 \
                else max_start // 2
            idx = dense_frame_indices(n, self.clip_len, self.frame_sample_rate,
                                      start=start)
        return self.reader.get_batch(path, idx)


class RawFrameReader(VideoReaderBase):
    """Reads pre-extracted frame folders (ssv2.py filename_tmpl)."""

    def __init__(self, name_pattern: str = "img_{:05}.jpg", offset: int = 1):
        self.name_pattern = name_pattern
        self.offset = offset  # frame files index from 1

    def num_frames(self, path: str) -> int:
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        return len([f for f in os.listdir(path) if f.endswith((".jpg", ".png"))])

    def get_batch(self, path: str, indices) -> np.ndarray:
        import cv2

        frames = []
        for i in indices:
            fp = os.path.join(path, self.name_pattern.format(int(i) + self.offset))
            img = cv2.imread(fp)
            if img is None:
                raise RuntimeError(f"missing frame {fp}")
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        return np.stack(frames)


class SSRawFrameClsDataset(VideoClsDatasetSparse):
    """Something-Something raw-frame dataset (ssv2.py:46-341): annotation
    lines are ``dir<sep>num_frames<sep>label`` (frame count explicit, so no
    directory listing per sample); horizontal flip disabled (ssv2 temporal
    semantics, kinetics_sparse.py:258)."""

    def __init__(self, anno_path: str, sep: str = " ",
                 name_pattern: str = "img_{:05}.jpg", **kwargs):
        kwargs.setdefault("no_horizontal_flip", True)
        if kwargs.get("reader") is None:
            kwargs["reader"] = RawFrameReader(name_pattern)
        super().__init__(anno_path, sep=sep, **kwargs)
        # re-parse for the optional middle frame-count column
        self._frame_counts = {}
        with open(anno_path) as f:
            for line in f:
                parts = line.strip().split(sep)
                if len(parts) >= 3:
                    self._frame_counts[parts[0]] = int(parts[1])

    def _load_clip(self, path: str, chunk_nb: int,
                   rng: np.random.Generator) -> np.ndarray:
        from unite_tpu.data.samplers import sparse_frame_indices

        count = self._frame_counts.get(path, -1)
        if count <= 0:
            count = self.reader.num_frames(path)
        nseg = self.test_num_segment if self.mode == "test" else 1
        idx = sparse_frame_indices(count, self.clip_len, clip_idx=chunk_nb,
                                   test_num_segment=nseg, rng=rng)
        return self.reader.get_batch(path, idx)
