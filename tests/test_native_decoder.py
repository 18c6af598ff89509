"""Native C++ video decoder tests (against cv2 ground truth)."""

import os

import numpy as np
import pytest

from unite_tpu.data.video_reader import CV2VideoReader, NativeVideoReader

pytestmark = pytest.mark.skipif(
    not NativeVideoReader.available(),
    reason="libunite_videodec.so not built (run unite_tpu/native/build.sh)",
)


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    for i in range(60):
        f = np.zeros((48, 64, 3), np.uint8)
        f[:, :, 0] = (i * 4) % 256
        f[5:15, 5:25] = 200
        w.write(f)
    w.release()
    return path


def test_num_frames(video_file):
    assert NativeVideoReader().num_frames(video_file) == 60


def test_get_batch_matches_cv2(video_file):
    idx = [0, 7, 7, 59, 3, 30, 1]
    native = NativeVideoReader().get_batch(video_file, idx)
    cv = CV2VideoReader().get_batch(video_file, idx)
    assert native.shape == (7, 48, 64, 3)
    np.testing.assert_array_equal(native, cv)


def test_get_batch_sequential_and_backward(video_file):
    r = NativeVideoReader()
    fwd = r.get_batch(video_file, list(range(0, 60, 10)))
    bwd = r.get_batch(video_file, list(range(50, -1, -10)))
    np.testing.assert_array_equal(fwd, bwd[::-1])


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        NativeVideoReader().get_batch("/does/not/exist.mp4", [0])


def test_out_of_range_index_clamps_or_errors(video_file):
    r = NativeVideoReader()
    # decord-style grace: indices past EOF reuse the last decoded frame
    out = r.get_batch(video_file, [59, 200])
    np.testing.assert_array_equal(out[0], out[1])
