"""ctypes bindings for the native video I/O shim (io/native/videoio.cc).

Auto-builds `libvideoio.so` on first use (plain g++ + pkg-config; no
pybind11 needed).  Falls back gracefully: callers should catch
`NativeVideoUnavailable` and use the OpenCV path in io/video.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvideoio.so")


class NativeVideoUnavailable(RuntimeError):
    pass


_lib = None


def load_library(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not build_if_missing:
            raise NativeVideoUnavailable("libvideoio.so not built")
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, OSError) as e:
            raise NativeVideoUnavailable(
                f"failed to build libvideoio.so: {e}") from e
    lib = ctypes.CDLL(_SO_PATH)
    lib.vr_open.restype = ctypes.c_void_p
    lib.vr_open.argtypes = [ctypes.c_char_p]
    lib.vr_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.vr_read.restype = ctypes.c_int
    lib.vr_read.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_uint8)]
    lib.vr_close.argtypes = [ctypes.c_void_p]
    lib.vw_open.restype = ctypes.c_void_p
    lib.vw_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                            ctypes.c_double]
    lib.vw_open2.restype = ctypes.c_void_p
    lib.vw_open2.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                             ctypes.c_double, ctypes.c_char_p]
    lib.vw_write.restype = ctypes.c_int
    lib.vw_write.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_uint8)]
    lib.vw_write_yuv420.restype = ctypes.c_int
    lib.vw_write_yuv420.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.POINTER(ctypes.c_uint8)]
    lib.vw_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeVideoReader:
    """Streaming RGB24 reader backed by the C++ decode thread."""

    def __init__(self, path: str):
        lib = load_library()
        self._lib = lib
        self._h = lib.vr_open(path.encode())
        if not self._h:
            raise IOError(f"native reader: cannot open {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_int64()
        lib.vr_info(self._h, ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(fps), ctypes.byref(n))
        self.width, self.height = w.value, h.value
        self.fps = fps.value or 25.0
        self.frame_count = n.value

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            buf = np.empty((self.height, self.width, 3), np.uint8)
            ok = self._lib.vr_read(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if not ok:
                break
            yield buf

    def close(self):
        if self._h:
            self._lib.vr_close(self._h)
            self._h = None


class NativeVideoWriter:
    """codec: 'auto' (libx265 -> libx264 -> mpeg4), 'libx265' (reference
    output parity: CRF 18, hvc1 tag — reference inference.py:30-35),
    'libx264', or 'mpeg4'; an optional ':preset=<name>' suffix (e.g.
    'libx265:preset=superfast') overrides the encoder speed preset, and
    an optional trailing ':params=k=v,k=v' passes extra encoder private
    options (appended to x265-params for libx265, commas become ':').
    An explicitly requested codec that the libav build lacks raises
    (no silent substitution)."""

    def __init__(self, path: str, fps: float, size_hw: Tuple[int, int],
                 codec: str = "auto"):
        lib = load_library()
        self._lib = lib
        h, w = size_hw
        self.width, self.height = w, h
        self._h = lib.vw_open2(path.encode(), w, h, float(fps),
                               codec.encode())
        if not self._h:
            raise IOError(
                f"native writer: cannot open {path} with codec={codec!r} "
                "(an explicitly requested encoder that is unavailable fails "
                "rather than silently substituting another)")

    supports_yuv420 = True

    def write(self, rgb_frame: np.ndarray):
        f = np.ascontiguousarray(rgb_frame, np.uint8)
        rc = self._lib.vw_write(
            self._h, f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError("native writer: encode failed")

    def write_yuv420(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Pre-converted planes: y [H, W], u/v [H/2, W/2] uint8 (the device
        does the BT.601 conversion + 2x2 chroma subsampling, halving the
        device->host transfer; pipeline.py)."""
        p = ctypes.POINTER(ctypes.c_uint8)
        y = np.ascontiguousarray(y, np.uint8)
        u = np.ascontiguousarray(u, np.uint8)
        v = np.ascontiguousarray(v, np.uint8)
        rc = self._lib.vw_write_yuv420(self._h, y.ctypes.data_as(p),
                                       u.ctypes.data_as(p),
                                       v.ctypes.data_as(p))
        if rc != 0:
            raise IOError("native writer: yuv encode failed")

    def close(self):
        if self._h:
            self._lib.vw_close(self._h)
            self._h = None
