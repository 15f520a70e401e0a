"""Host-side video I/O.

The reference shells out to bundled static ffmpeg binaries and moves frames
through rawvideo pipes one at a time (reference inference.py:21-80).  Here:

  * decode/encode run on OpenCV's built-in FFmpeg (no external binary),
  * frames flow in *batches of sliding windows* so the TPU sees large
    batched work instead of one 3-frame window per dispatch,
  * JAX's async dispatch overlaps host decode of batch k+1 with device
    compute of batch k (double buffering without threads).

An optional C++ accelerated decode path can be layered underneath later;
this module is the portable fallback and the interface.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class VideoReader:
    """Streaming BGR->RGB frame reader."""

    def __init__(self, path: str):
        if cv2 is None:
            raise RuntimeError("OpenCV is required for video I/O")
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 25.0
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            yield frame[..., ::-1]  # BGR -> RGB (the reference's rgb24 pipe)

    def close(self):
        self.cap.release()


class VideoWriter:
    """RGB frame writer (mp4v; reference uses libx265 via ffmpeg)."""

    def __init__(self, path: str, fps: float, size_hw: Tuple[int, int]):
        if cv2 is None:
            raise RuntimeError("OpenCV is required for video I/O")
        h, w = size_hw
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
        if not self.writer.isOpened():
            raise IOError(f"cannot open video writer: {path}")

    def write(self, rgb_frame: np.ndarray):
        self.writer.write(np.ascontiguousarray(rgb_frame[..., ::-1]))

    def close(self):
        self.writer.release()


def sliding_windows(frames: Iterator[np.ndarray], radius: int = 1
                    ) -> Iterator[List[np.ndarray]]:
    """Yield (2r+1)-frame windows centered on every input frame, with
    first/last-frame duplication padding (reference inference.py:37-74)."""
    buf: List[np.ndarray] = []
    for frame in frames:
        if not buf:
            buf = [frame] * (radius + 1)   # left padding
        else:
            buf.append(frame)
        if len(buf) == 2 * radius + 1:
            yield list(buf)
            buf.pop(0)
    if not buf:
        return
    for _ in range(radius):                # right padding
        buf.append(buf[-1])
        if len(buf) == 2 * radius + 1:
            yield list(buf)
            buf.pop(0)


def batched(iterable, n: int):
    batch = []
    for item in iterable:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        yield batch
