"""Eval metrics: PSNR/SSIM parity with torch-based formulas, LPIPS sanity,
landmark metrics math."""

import numpy as np
import pytest

from pgtformer_tpu.eval.metrics import (
    calculate_psnr, calculate_ssim, landmark_distance,
    temporal_landmark_error, identity_degradation, evaluate_clip)


def test_psnr_basics():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 32, 3))
    assert calculate_psnr(a, a) == float("inf")
    b = np.clip(a + 0.1, 0, 1)
    v = calculate_psnr(a, b)
    assert 15 < v < 25
    # crop border changes the value when the border differs
    c = a.copy()
    c[:2] = 0
    assert calculate_psnr(a, c, crop_border=2) == float("inf")


def test_psnr_matches_direct_formula():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (16, 16, 3))
    b = rng.uniform(0, 1, (16, 16, 3))
    mse = np.mean(((a - b) * 255) ** 2)
    expected = 10 * np.log10(255 ** 2 / mse)
    np.testing.assert_allclose(calculate_psnr(a, b), expected, rtol=1e-10)


def test_ssim_basics():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (64, 64, 3))
    np.testing.assert_allclose(calculate_ssim(a, a), 1.0, atol=1e-9)
    noisy = np.clip(a + rng.normal(scale=0.2, size=a.shape), 0, 1)
    v = calculate_ssim(a, noisy)
    assert 0.0 < v < 0.9


def test_lpips_sanity():
    import jax.numpy as jnp
    from pgtformer_tpu.train.lpips import make_lpips_fn
    fn = make_lpips_fn()
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    d_same = np.asarray(fn(a, a))
    d_diff = np.asarray(fn(a, b))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0.01).all()
    # slightly perturbed is closer than random
    a2 = jnp.clip(a + 0.02, 0, 1)
    assert float(np.mean(np.asarray(fn(a, a2)))) < float(np.mean(d_diff))


def test_landmark_metrics():
    lm = np.array([[0.0, 0.0], [1.0, 1.0]])
    assert landmark_distance(lm, lm) == 0.0
    assert landmark_distance(lm + [3.0, 4.0], lm) == 5.0

    T = 4
    gt = np.stack([lm + [t, 0] for t in range(T)])          # smooth motion
    pred_same_motion = gt + 0.5                              # offset, same motion
    assert temporal_landmark_error(pred_same_motion, gt) == 0.0
    jitter = gt.copy()
    jitter[2] += 1.0
    assert temporal_landmark_error(jitter, gt) > 0.0

    e = np.array([1.0, 0.0])
    assert identity_degradation(e, e) < 1e-3
    np.testing.assert_allclose(identity_degradation(e, [0.0, 1.0]), 90.0)


def test_evaluate_clip():
    rng = np.random.default_rng(4)
    gt = rng.uniform(0, 1, (3, 32, 32, 3))
    pred = np.clip(gt + rng.normal(scale=0.05, size=gt.shape), 0, 1)
    m = evaluate_clip(pred, gt)
    assert 20 < m["psnr"] < 40 and 0.3 < m["ssim"] <= 1.0
