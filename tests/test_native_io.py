"""Native (C++/libav) video I/O shim: build, decode/encode roundtrip,
parity with the OpenCV backend."""

import os

import numpy as np
import pytest

from pgtformer_tpu.io.native import (
    load_library, NativeVideoReader, NativeVideoWriter, NativeVideoUnavailable)
from pgtformer_tpu.io.video import VideoReader


@pytest.fixture(scope="module")
def native_lib():
    try:
        return load_library()
    except NativeVideoUnavailable as e:
        pytest.skip(f"native video io unavailable: {e}")


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory, native_lib):
    import cv2
    path = str(tmp_path_factory.mktemp("nv") / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    rng = np.random.default_rng(0)
    frames = []
    for i in range(12):
        # smooth frames so lossy codecs roundtrip closely
        f = np.full((64, 64, 3), i * 20, np.uint8)
        f[:, :32] = 255 - i * 20
        frames.append(f)
        w.write(f)
    w.release()
    return path, frames


def test_native_reader_matches_cv2(native_lib, sample_video):
    path, _ = sample_video
    r = NativeVideoReader(path)
    assert (r.width, r.height) == (64, 64)
    assert abs(r.fps - 25.0) < 0.01
    native_frames = list(r)
    r.close()
    cv = VideoReader(path)
    cv_frames = list(cv)
    cv.close()
    assert len(native_frames) == len(cv_frames) == 12
    for a, b in zip(native_frames, cv_frames):
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 2.0


def test_native_writer_roundtrip(native_lib, sample_video, tmp_path):
    path, frames = sample_video
    out = str(tmp_path / "out.mp4")
    w = NativeVideoWriter(out, 25, (64, 64))
    for f in frames:
        w.write(f)
    w.close()
    assert os.path.getsize(out) > 0
    r = NativeVideoReader(out)
    decoded = list(r)
    r.close()
    assert len(decoded) == len(frames)
    err = np.mean([np.abs(a.astype(int) - b.astype(int)).mean()
                   for a, b in zip(decoded, frames)])
    assert err < 6.0, err  # x264 crf18 is visually lossless-ish
