"""Build a small VFHQ-layout dataset from the reference demo video, for
sustained on-chip training runs in an environment with no VFHQ access.

Layout produced (data/vfhq.py):
    <out>/train/GT/<clip>/%08d.png   (512x512 face frames)
    <out>/val/GT/<clip>/%08d.png

LQ is synthesized on the fly by the blind degradation pipeline
(data/degradations.py blind_degrade_clip), exactly like training without a
pre-rendered LR_Blind tree.

Usage: python tools/make_demo_dataset.py [--video PATH] [--out /tmp/vfhq_demo]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video",
                    default="/root/reference/assets/inputdemovideo.mp4")
    ap.add_argument("--out", default="/tmp/vfhq_demo")
    ap.add_argument("--train-clips", type=int, default=3)
    ap.add_argument("--val-frames", type=int, default=15)
    args = ap.parse_args()

    import cv2
    cap = cv2.VideoCapture(args.video)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        if f.shape[:2] != (512, 512):
            f = cv2.resize(f, (512, 512), interpolation=cv2.INTER_CUBIC)
        frames.append(f)
    cap.release()
    assert frames, f"no frames decoded from {args.video}"

    val = frames[-args.val_frames:]
    train = frames[:-args.val_frames]
    per_clip = len(train) // args.train_clips

    def dump(split, clip, imgs):
        d = os.path.join(args.out, split, "GT", clip)
        os.makedirs(d, exist_ok=True)
        for i, img in enumerate(imgs):
            cv2.imwrite(os.path.join(d, f"{i:08d}.png"), img)

    for c in range(args.train_clips):
        dump("train", f"demo_{c:03d}",
             train[c * per_clip:(c + 1) * per_clip])
    dump("val", "demo_val", val)
    print(f"wrote {len(train)} train frames in {args.train_clips} clips + "
          f"{len(val)} val frames under {args.out}")


if __name__ == "__main__":
    main()
