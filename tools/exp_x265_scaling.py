"""x265 per-thread scaling on the product-path host (round-4; VERDICT #5).

The reference's output format is libx265 CRF18 hvc1
(/root/reference/inference.py:30-35).  Round 3 measured the x265
superfast product path at 9.8 fps steady vs 34 device fps, with the
single encoder thread saturating this 1-core host.  VERDICT r3 asks for
segment-parallel encode and/or pools/frame-threads tuning, "or a
measured per-thread scaling table proving the 1-core wall".  This host
has nproc == 1, so segment-parallel encoding cannot exceed single-core
x265 throughput by construction; this harness measures that wall:

- pure-encode fps (no TPU, no decode in the loop) for x265 presets
  medium (ffmpeg-CLI default, what the reference command uses) through
  ultrafast, at CRF18;
- frame-threads / pools sweeps via the writer's new ":params=" codec
  suffix (io/native/videoio.cc vw_open2) — on 1 core, extra encoder
  threads can only add context-switch overhead;
- an x264 row for cross-codec context.

Input frames are a real restored 512x512 clip (the product path's
actual output statistics), pre-converted to YUV420 outside the timed
loop so the numbers are encoder-only.

Run: python tools/exp_x265_scaling.py [--src /tmp/verify_r3c.mp4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgtformer_tpu.io.native import NativeVideoReader, NativeVideoWriter


def rgb_to_yuv420(rgb: np.ndarray):
    """BT.601 full-range RGB -> planar YUV420, same math the device-side
    readback path uses (pipeline.py yuv420 readback)."""
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    y8 = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    u8 = np.clip(u[0::2, 0::2] + 0.5, 0, 255).astype(np.uint8)
    v8 = np.clip(v[0::2, 0::2] + 0.5, 0, 255).astype(np.uint8)
    return y8, u8, v8


def synthetic_frames(n, h, w, seed=0):
    """Fallback when no real clip exists: low-frequency moving texture
    (flat noise would be un-encodable at CRF18; flat color trivial)."""
    rng = np.random.default_rng(seed)
    base = rng.random((h // 8, w // 8, 3)).astype(np.float32)
    base = np.kron(base, np.ones((8, 8, 1), np.float32))
    out = []
    for i in range(n):
        shifted = np.roll(base, i * 3, axis=1)
        tex = rng.random((h, w, 1)).astype(np.float32) * 0.08
        out.append(np.clip((shifted + tex) * 255, 0, 255).astype(np.uint8))
    return out


def load_frames(src):
    if src and os.path.exists(src):
        frames = list(NativeVideoReader(src))
        print(f"# source: {src} ({len(frames)} frames "
              f"{frames[0].shape[0]}x{frames[0].shape[1]})")
    else:
        frames = synthetic_frames(120, 512, 512)
        print("# source: synthetic 120x512x512 (real clip not found)")
    return [rgb_to_yuv420(f) for f in frames]


def time_encode(yuv, codec, loops=1):
    h, w = yuv[0][0].shape
    total_frames = 0
    t0 = time.perf_counter()
    for _ in range(loops):
        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            path = f.name
        wr = NativeVideoWriter(path, 25.0, (h, w), codec=codec)
        for y, u, v in yuv:
            wr.write_yuv420(y, u, v)
        wr.close()
        size = os.path.getsize(path)
        os.unlink(path)
        total_frames += len(yuv)
    dt = time.perf_counter() - t0
    return total_frames / dt, size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/verify_r3c.mp4")
    ap.add_argument("--loops", type=int, default=2)
    args = ap.parse_args()

    yuv = load_frames(args.src)

    configs = [
        # the reference command's exact setting (ffmpeg CLI default preset)
        ("libx265:preset=medium", "x265 medium CRF18 (reference cmd)"),
        ("libx265:preset=fast", "x265 fast"),
        ("libx265:preset=superfast", "x265 superfast"),
        ("libx265:preset=ultrafast", "x265 ultrafast"),
        # thread scaling at the fastest preset: proves (or disproves)
        # the 1-core wall — frame-threads adds pipeline parallelism,
        # pools controls the WPP worker pool
        ("libx265:preset=superfast:params=pools=1,frame-threads=1",
         "x265 superfast ft=1"),
        ("libx265:preset=superfast:params=pools=1,frame-threads=2",
         "x265 superfast ft=2"),
        ("libx265:preset=superfast:params=pools=1,frame-threads=4",
         "x265 superfast ft=4"),
        ("libx265:preset=ultrafast:params=pools=1,frame-threads=4",
         "x265 ultrafast ft=4"),
        # cross-codec context
        ("libx264:preset=ultrafast", "x264 ultrafast"),
    ]

    rows = []
    for codec, label in configs:
        try:
            fps, size = time_encode(yuv, codec, loops=args.loops)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{label:<38} FAILED: {e}")
            continue
        rows.append({"config": label, "codec": codec,
                     "fps": round(fps, 2), "mb": round(size / 1e6, 2)})
        print(f"{label:<38} {fps:7.2f} fps   {size/1e6:6.2f} MB")

    print(json.dumps({"nproc": os.cpu_count(), "rows": rows}))


if __name__ == "__main__":
    main()
