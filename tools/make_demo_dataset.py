"""Build a small VFHQ-layout dataset from the reference demo video, for
sustained on-chip training runs in an environment with no VFHQ access.

Layout produced (data/vfhq.py):
    <out>/train/GT/<clip>/%08d.png   (512x512 face frames)
    <out>/val/GT/<clip>/%08d.png

LQ is synthesized on the fly by the blind degradation pipeline
(data/degradations.py blind_degrade_clip), exactly like training without a
pre-rendered LR_Blind tree.

`--augment N` additionally writes N augmented variants of every TRAIN clip
(val is never augmented): a per-clip similarity warp (rotation, scale,
translation; reflect borders) + optional hflip + photometric jitter (gamma,
per-channel gain, brightness), the SAME transform applied to every frame of
the clip so temporal dynamics survive.  Purpose: delay discriminator
memorization in the GAN stages — on the raw ~100-frame set a pretrained D
separates real/fake by ~step 400 and the hinge loss saturates
(BASELINE.md round-4 caveat); an order of magnitude more distinct GT
images pushes that far past a few-thousand-iter run.

Usage: python tools/make_demo_dataset.py [--video PATH] [--out /tmp/vfhq_demo]
                                         [--augment 9]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def augment_clip(frames, rng):
    """One per-clip augmentation: similarity warp + hflip + photometric,
    identical for every frame (temporal consistency)."""
    import cv2
    h, w = frames[0].shape[:2]
    angle = float(rng.uniform(-12.0, 12.0))
    scale = float(rng.uniform(0.88, 1.15))
    tx = float(rng.uniform(-0.04, 0.04)) * w
    ty = float(rng.uniform(-0.04, 0.04)) * h
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
    M[0, 2] += tx
    M[1, 2] += ty
    flip = bool(rng.random() < 0.5)
    gamma = float(rng.uniform(0.8, 1.25))
    gain = rng.uniform(0.92, 1.08, size=3)
    bright = float(rng.uniform(-0.05, 0.05))

    out = []
    for f in frames:
        g = cv2.warpAffine(f, M, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT101)
        if flip:
            g = g[:, ::-1]
        x = (g.astype(np.float32) / 255.0) ** gamma
        x = np.clip(x * gain[None, None, :] + bright, 0.0, 1.0)
        out.append(np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video",
                    default="/root/reference/assets/inputdemovideo.mp4")
    ap.add_argument("--out", default="/tmp/vfhq_demo")
    ap.add_argument("--train-clips", type=int, default=3)
    ap.add_argument("--val-frames", type=int, default=15)
    ap.add_argument("--augment", type=int, default=0,
                    help="augmented variants per train clip (val untouched)")
    ap.add_argument("--seed", type=int, default=2024)
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

    n_train = 0
    rng = np.random.default_rng(args.seed)
    for c in range(args.train_clips):
        seg = train[c * per_clip:(c + 1) * per_clip]
        dump("train", f"demo_{c:03d}", seg)
        n_train += len(seg)
        for k in range(args.augment):
            aug = augment_clip(seg, rng)
            dump("train", f"demo_{c:03d}_a{k:02d}", aug)
            n_train += len(aug)
    dump("val", "demo_val", val)
    print(f"wrote {n_train} train frames in "
          f"{args.train_clips * (1 + args.augment)} clips + "
          f"{len(val)} val frames under {args.out}")


if __name__ == "__main__":
    main()
