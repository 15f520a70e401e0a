"""Utility surface: NIQE algorithm, image helpers, profiling helpers."""

import numpy as np
import pytest

from pgtformer_tpu.utils.img import imfrombytes, img2array, array2img
from pgtformer_tpu.utils.profiling import StageTimer, codebook_stats


def test_imfrombytes_roundtrip():
    import cv2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img[..., ::-1])
    out = imfrombytes(buf.tobytes())
    np.testing.assert_array_equal(out, img)
    f = imfrombytes(buf.tobytes(), float32=True)
    assert f.dtype == np.float32 and f.max() <= 1.0


def test_img_array_roundtrip():
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(array2img(img2array(u8)), u8)


def test_niqe_with_synthetic_pristine_params(tmp_path):
    """NIQE runs end-to-end with a (synthetic) pristine model and yields a
    finite, input-dependent score."""
    from pgtformer_tpu.eval.niqe import calculate_niqe, compute_feature

    rng = np.random.default_rng(2)
    # build synthetic pristine stats from white-noise 'pristine' patches
    feats = []
    for _ in range(24):
        block = rng.normal(size=(96, 96))
        feats.append(compute_feature(block))
    feats = np.array(feats)
    feats = np.concatenate([feats, feats], axis=1)  # two scales
    mu = feats.mean(0)
    cov = np.cov(feats, rowvar=False) + np.eye(feats.shape[1]) * 1e-3
    path = str(tmp_path / "pris.npz")
    np.savez(path, mu_pris_param=mu, cov_pris_param=cov)

    img_a = rng.uniform(0, 1, (192, 192, 3))
    img_b = np.clip(img_a + rng.normal(scale=0.2, size=img_a.shape), 0, 1)
    sa = calculate_niqe(img_a, path)
    sb = calculate_niqe(img_b, path)
    assert np.isfinite(sa) and np.isfinite(sb)
    assert abs(sa - sb) > 1e-6  # input-dependent


def test_niqe_gt_fit_pipeline(tmp_path):
    """The --niqe-fit-gt path: fit the pristine MVG from 'GT' images via
    the public feature API, score distorted vs clean — the clean image
    must sit closer to the fitted model, and scoring an image through
    `calculate_niqe` with the fitted params saved to .npz must agree with
    `niqe_from_features` on the same features (refactor guard)."""
    from pgtformer_tpu.eval.niqe import (
        image_niqe_features, fit_pris_params, niqe_from_features,
        calculate_niqe)

    rng = np.random.default_rng(3)
    base = rng.uniform(0.2, 0.8, (192, 192, 3))
    import cv2
    gts = [np.clip(cv2.GaussianBlur(
        base + rng.normal(scale=0.05, size=base.shape), (0, 0), 1.2),
        0, 1) for _ in range(6)]
    mu, cov = fit_pris_params([image_niqe_features(g) for g in gts])
    cov = cov + np.eye(cov.shape[0]) * 1e-3

    clean = gts[0]
    noisy = np.clip(clean + rng.normal(scale=0.25, size=clean.shape), 0, 1)
    s_clean = niqe_from_features(image_niqe_features(clean), mu, cov)
    s_noisy = niqe_from_features(image_niqe_features(noisy), mu, cov)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean  # heavy noise reads as less natural

    path = str(tmp_path / "fit.npz")
    np.savez(path, mu_pris_param=mu, cov_pris_param=cov)
    np.testing.assert_allclose(calculate_niqe(clean, path), s_clean,
                               rtol=1e-10)


def test_stage_timer_and_codebook_stats():
    t = StageTimer()
    with t.stage("x"):
        pass
    s = t.summary()
    assert "x" in s and s["x"]["count"] == 1

    codes = np.array([0, 0, 1, 2, 2, 2])
    st = codebook_stats(codes, n_embed=8)
    assert abs(st["usage_ratio"] - 3 / 8) < 1e-9
    assert 1.0 < st["perplexity"] <= 3.0
