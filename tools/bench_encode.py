"""Measure the native writer's encode throughput across codec / preset /
x265 thread settings — the product path's reference format is x265 CRF18
hvc1 (reference inference.py:30-35) and on 1-core hosts the encoder thread
is the end-to-end ceiling (BASELINE.md round-3 tables).

Produces the per-preset/threads scaling table that decides whether
segment-parallel encoding can pay on this host (it cannot on 1 core: N
encoder instances share the core, so aggregate fps is flat — the table
proves the wall rather than guessing at it).

Usage: python tools/bench_encode.py [--frames 96] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_frames(n: int, hw: int, seed: int = 0):
    """Video-like test content: moving gradient + band-limited noise
    (pure noise over-penalizes intra search; flat frames under-penalize)."""
    import cv2
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (hw // 8, hw // 8, 3), np.uint8)
    base = cv2.resize(base, (hw, hw), interpolation=cv2.INTER_CUBIC)
    out = []
    for i in range(n):
        m = np.roll(base, (3 * i, 5 * i), axis=(0, 1)).astype(np.int16)
        m += rng.integers(-8, 8, m.shape, np.int16)
        out.append(np.clip(m, 0, 255).astype(np.uint8))
    return out


def bench_one(frames, fps, codec, path):
    from pgtformer_tpu.io.native import NativeVideoWriter
    t0 = time.perf_counter()
    w = NativeVideoWriter(path, fps, frames[0].shape[:2], codec=codec)
    for f in frames:
        w.write(f)
    w.close()
    dt = time.perf_counter() - t0
    size = os.path.getsize(path)
    os.unlink(path)
    return len(frames) / dt, size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="/tmp/bench_encode.json")
    args = ap.parse_args()

    frames = synth_frames(args.frames, args.size)
    rows = []
    cases = [
        ("libx264", "ultrafast"), ("libx264", "fast"),
        ("libx265", "ultrafast"), ("libx265", "superfast"),
        ("libx265", "fast"), ("libx265", "medium"),
        ("mpeg4", None),
    ]
    for codec, preset in cases:
        name = codec if preset is None else f"{codec}:preset={preset}"
        try:
            fps, size = bench_one(frames, 25.0, name, "/tmp/_enc_test.mp4")
        except Exception as e:
            rows.append({"codec": codec, "preset": preset,
                         "error": str(e)})
            continue
        rows.append({"codec": codec, "preset": preset,
                     "fps": round(fps, 2),
                     "kbits_per_frame": round(size * 8 / 1000 / len(frames),
                                              1)})
        print(rows[-1], flush=True)

    out = {"host_cores": os.cpu_count(), "frames": args.frames,
           "size": args.size, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
