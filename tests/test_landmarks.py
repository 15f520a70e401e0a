"""Face-metric plumbing: 5-point parser-fallback landmarks, MSRL, and the
eval CLI emitting every README column (Deg/LMD/TLME/MSRL —
reference README.md:127; the reference ships no implementation of these)."""

import os

import numpy as np
import pytest

from pgtformer_tpu.eval.landmarks import (
    landmarks_from_parsing, msrl, face_metrics_frame,
    GrayPatchEmbedder, CLS_L_EYE, CLS_R_EYE, CLS_NOSE, CLS_MOUTH)


def _synthetic_parsing(h=64, w=64):
    m = np.zeros((h, w), np.int64)
    m[20:24, 16:22] = CLS_L_EYE
    m[20:24, 42:48] = CLS_R_EYE
    m[32:38, 30:34] = CLS_NOSE
    m[46:50, 22:42] = CLS_MOUTH[1]
    return m


def test_landmarks_from_parsing_geometry():
    lm = landmarks_from_parsing(_synthetic_parsing(), out_size=512)
    assert lm.shape == (5, 2)
    s = 512 / 64
    np.testing.assert_allclose(lm[0], [18.5 * s, 21.5 * s], atol=1e-6)
    np.testing.assert_allclose(lm[1], [44.5 * s, 21.5 * s], atol=1e-6)
    np.testing.assert_allclose(lm[2], [31.5 * s, 34.5 * s], atol=1e-6)
    assert lm[3][0] < lm[4][0]            # left mouth corner left of right
    # missing classes fall back to image center
    lm2 = landmarks_from_parsing(np.zeros((64, 64), np.int64), 512)
    np.testing.assert_allclose(lm2, 256.0)


def test_msrl_properties():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    lm = np.array([[40, 40], [90, 40], [64, 64], [45, 95], [85, 95]],
                  np.float64)
    assert msrl(gt, gt, lm, base_crop=32) == float("inf")
    noisy = np.clip(gt + rng.normal(scale=0.05, size=gt.shape), 0, 1
                    ).astype(np.float32)
    v = msrl(noisy, gt, lm, base_crop=32)
    assert 10.0 < v < 40.0
    # more degradation -> lower MSRL
    worse = np.clip(gt + rng.normal(scale=0.2, size=gt.shape), 0, 1
                    ).astype(np.float32)
    assert msrl(worse, gt, lm, base_crop=32) < v


def test_face_metrics_frame_with_stub_detector():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(scale=0.02, size=gt.shape), 0, 1
                   ).astype(np.float32)

    det = lambda img: np.array([[20, 20], [44, 20], [32, 34],
                                [24, 46], [40, 46]], np.float64)
    m = face_metrics_frame(pred, gt, det, GrayPatchEmbedder())
    assert set(m) == {"deg", "lmd", "msrl", "_lm_pred", "_lm_gt"}
    assert m["lmd"] == 0.0                 # same detector, same landmarks
    assert 0.0 <= m["deg"] < 90.0
    assert np.isfinite(m["msrl"])


@pytest.mark.slow
def test_eval_cli_emits_all_columns(tmp_path, monkeypatch, capsys):
    """eval_cli --face-metrics on a tiny synthetic clip emits
    psnr/ssim/lpips/deg/lmd/msrl/tlme."""
    import cv2
    import pgtformer_tpu.config as config_mod
    from tests.test_train import SMALL_PGT

    monkeypatch.setattr(config_mod, "RELEASE_PGTFORMER", SMALL_PGT)

    root = tmp_path / "vfhq"
    rng = np.random.default_rng(0)
    os.makedirs(root / "GT" / "clip_a")
    for i in range(4):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "GT" / "clip_a" / f"{i:08d}.png"), img)

    from pgtformer_tpu.eval_cli import main
    rc = main(["--data-root", str(root), "--batch", "1", "--limit", "3",
               "--face-metrics", "--fp32"])
    assert rc == 0
    out = capsys.readouterr().out
    # parity-grade columns print bare; fallback-driven columns are labeled
    # at the output surface so tables cannot be mistaken for
    # paper-comparable numbers (VERDICT round-2 item 6)
    for col in ("psnr", "ssim", "lpips(random-vgg)", "deg(proxy-embedder)",
                "lmd(parser-lm)", "msrl(own-def)", "tlme(parser-lm)"):
        assert f"{col}:" in out, (col, out)
    assert "\nlpips:" not in out and "\ndeg:" not in out
