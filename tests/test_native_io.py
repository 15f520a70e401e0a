"""Native (C++/libav) video I/O shim: build, decode/encode roundtrip,
parity with the OpenCV backend."""

import os

import numpy as np
import pytest

from pgtformer_tpu.io.native import (
    load_library, NativeVideoReader, NativeVideoWriter, NativeVideoUnavailable)
from pgtformer_tpu.io.video import VideoReader


pytestmark = pytest.mark.quick


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


def test_native_writer_x265_hvc1(native_lib, tmp_path):
    """libx265 CRF18 output parity (reference inference.py:30-35:
    -c:v libx265 -crf 18 -tag:v hvc1): correct frame count, Apple hvc1
    sample-entry tag, lossy-roundtrip quality."""
    path = str(tmp_path / "out265.mp4")
    gx = np.linspace(40, 215, 64, dtype=np.float32)
    base = np.stack([np.tile(gx, (64, 1)), np.tile(gx[::-1], (64, 1)),
                     np.tile(gx[:, None], (1, 64))], -1).astype(np.uint8)
    frames = [np.roll(base, 2 * i, axis=1) for i in range(10)]
    w = NativeVideoWriter(path, 25.0, (64, 64), codec="libx265")
    for f in frames:
        w.write(f)
    w.close()

    data = open(path, "rb").read()
    assert b"hvc1" in data and b"hev1" not in data

    r = NativeVideoReader(path)
    got = list(r)
    r.close()
    assert len(got) == 10
    err = np.mean([np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
                   for a, b in zip(got, frames)])
    assert err < 12.0, err  # CRF18 lossy but close


def test_native_writer_codec_fallback(native_lib, tmp_path):
    """Unknown codec name falls back to a working encoder."""
    path = str(tmp_path / "outfb.mp4")
    w = NativeVideoWriter(path, 25.0, (64, 64), codec="auto")
    for _ in range(3):
        w.write(np.zeros((64, 64, 3), np.uint8))
    w.close()
    r = NativeVideoReader(path)
    assert len(list(r)) == 3
    r.close()


def test_native_writer_explicit_codec_no_silent_substitute(native_lib,
                                                           tmp_path):
    """An explicitly requested encoder that the libav build lacks must FAIL
    (reference-parity intent: --codec libx265 must never silently produce
    an H.264 file)."""
    with pytest.raises(IOError):
        NativeVideoWriter(str(tmp_path / "x.mp4"), 25.0, (64, 64),
                          codec="libnotacodec")


def test_native_writer_params_suffix(native_lib, tmp_path):
    """':params=k=v,k=v' suffix (what `cli.py --codec-params` composes)
    reaches the encoder's private options and still produces a decodable
    file — the BASELINE.md x265-scaling recommendation path."""
    path = str(tmp_path / "outpp.mp4")
    try:
        w = NativeVideoWriter(
            path, 25.0, (64, 64),
            codec="libx265:preset=ultrafast:params=pools=1,frame-threads=1")
    except IOError:
        pytest.skip("libx265 unavailable in this libav build")
    for _ in range(3):
        w.write(np.zeros((64, 64, 3), np.uint8))
    w.close()
    r = NativeVideoReader(path)
    assert len(list(r)) == 3
    r.close()


def test_native_writer_preset_suffix(native_lib, tmp_path):
    """':preset=<name>' suffix is accepted and produces a decodable file."""
    path = str(tmp_path / "outp.mp4")
    try:
        w = NativeVideoWriter(path, 25.0, (64, 64),
                              codec="libx264:preset=ultrafast")
    except IOError:
        pytest.skip("libx264 unavailable in this libav build")
    for _ in range(3):
        w.write(np.zeros((64, 64, 3), np.uint8))
    w.close()
    r = NativeVideoReader(path)
    assert len(list(r)) == 3
    r.close()
