"""Data pipeline: degradations, MATLAB resize, alignment, VFHQ datasets,
sliding windows."""

import os

import numpy as np
import pytest

from pgtformer_tpu.data import degradations as D
from pgtformer_tpu.data.align import estimate_alignment, warp_to_template, FACE_TEMPLATE_512
from pgtformer_tpu.data.vfhq import VFHQTrainDataset, VFHQTestDataset, clip_batches
from pgtformer_tpu.io.video import sliding_windows


def test_blur_kernels_normalized_and_match_reference(reference):
    import sys, types, torch
    # reference degradations needs torchvision.transforms.functional_tensor
    ft = types.ModuleType("torchvision.transforms.functional_tensor")
    ft.rgb_to_grayscale = lambda x: x.mean(dim=-3, keepdim=True)
    sys.modules["torchvision.transforms.functional_tensor"] = ft
    sys.modules["torchvision.transforms"].functional_tensor = ft
    from data import degradations as ref_D

    k = D.bivariate_gaussian(21, 1.7, isotropic=True)
    k_ref = ref_D.bivariate_Gaussian(21, 1.7, None, None, isotropic=True)
    np.testing.assert_allclose(k, k_ref, atol=1e-10)

    k = D.bivariate_gaussian(21, 1.7, 0.8, 0.6, isotropic=False)
    k_ref = ref_D.bivariate_Gaussian(21, 1.7, 0.8, 0.6, isotropic=False)
    np.testing.assert_allclose(k, k_ref, atol=1e-10)

    k = D.bivariate_generalized_gaussian(15, 2.0, 1.0, 0.3, beta=1.5,
                                         isotropic=False)
    k_ref = ref_D.bivariate_generalized_Gaussian(15, 2.0, 1.0, 0.3, 1.5,
                                                 isotropic=False)
    np.testing.assert_allclose(k, k_ref, atol=1e-10)

    k = D.bivariate_plateau(15, 2.0, 1.0, 0.3, beta=1.5, isotropic=False)
    k_ref = ref_D.bivariate_plateau(15, 2.0, 1.0, 0.3, 1.5, isotropic=False)
    np.testing.assert_allclose(k, k_ref, atol=1e-10)

    k = D.circular_lowpass_kernel(np.pi / 3, 13, pad_to=21)
    k_ref = ref_D.circular_lowpass_kernel(np.pi / 3, 13, pad_to=21)
    np.testing.assert_allclose(k, k_ref, atol=1e-10)


def test_matlab_imresize_properties():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    small = D.imresize_matlab(img, 0.25)
    assert small.shape == (16, 16, 3)
    # constant image stays constant
    const = np.full((32, 32, 3), 0.5, np.float32)
    np.testing.assert_allclose(D.imresize_matlab(const, 0.25), 0.5, atol=1e-6)
    # mean roughly preserved (antialiased downsample)
    assert abs(small.mean() - img.mean()) < 0.01


def test_matlab_imresize_reproduces_linear_ramp():
    """Bicubic interpolation reproduces linear functions exactly in the
    interior (the Keys a=-0.5 kernel has quadratic precision)."""
    x = np.linspace(0, 1, 64)
    ramp = np.tile(x[None, :, None], (64, 1, 3)).astype(np.float64)
    small = D.imresize_matlab(ramp, 0.5)
    # interior columns are an exact linear ramp
    interior = small[16, 4:-4, 0]
    diffs = np.diff(interior)
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-10)


def test_blind_degrade_clip_deterministic():
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    a = D.blind_degrade_clip(frames, np.random.default_rng(42))
    b = D.blind_degrade_clip(frames, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)
    assert a.shape == frames.shape
    assert np.abs(a - frames).mean() > 1e-3  # actually degraded


def test_alignment_roundtrip():
    # landmarks exactly at template -> identity-ish warp
    m = estimate_alignment(FACE_TEMPLATE_512)
    np.testing.assert_allclose(m, np.array([[1, 0, 0], [0, 1, 0]],
                                           np.float64), atol=1e-6)
    rng = np.random.default_rng(4)
    img = (rng.uniform(0, 255, (512, 512, 3))).astype(np.uint8)
    warped = warp_to_template(img, m)
    np.testing.assert_array_equal(warped, img)


@pytest.fixture(scope="module")
def vfhq_root(tmp_path_factory):
    import cv2, json
    root = tmp_path_factory.mktemp("vfhq")
    rng = np.random.default_rng(0)
    landmarks = {}
    for clip in ("clip_a", "clip_b"):
        os.makedirs(root / "GT" / clip)
        for i in range(6):
            name = f"{i:08d}.png"
            img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
            cv2.imwrite(str(root / "GT" / clip / name), img)
            landmarks[f"GT/{clip}/{name}"] = (
                (FACE_TEMPLATE_512 / 8).tolist())
    with open(root / "landmarks.json", "w") as f:
        json.dump(landmarks, f)
    return str(root)


def test_vfhq_train_dataset(vfhq_root):
    ds = VFHQTrainDataset(vfhq_root, r=1, degradation="blr", seed=1)
    assert len(ds) == 12
    s = ds[0]
    assert s["gt"].shape == (3, 64, 64, 3)
    assert s["lq"].shape == (3, 64, 64, 3)
    assert s["llq"].shape == (3, 16, 16, 3)
    assert s["gt"].dtype == np.float32
    assert 0.0 <= s["gt"].min() and s["gt"].max() <= 1.0
    # deterministic
    s2 = ds[0]
    np.testing.assert_array_equal(s["gt"], s2["gt"])
    np.testing.assert_array_equal(s["lq"], s2["lq"])
    # border clamping: first window duplicates frame 0
    np.testing.assert_array_equal(s["gt"][0], s["gt"][1])


def test_vfhq_batches(vfhq_root):
    ds = VFHQTestDataset(vfhq_root, r=1, degradation="lr", inter_space=2)
    assert len(ds) == 6
    batches = list(clip_batches(ds, 2))
    assert len(batches) == 3
    assert batches[0]["gt"].shape == (2, 3, 64, 64, 3)
    assert batches[0]["llq"].shape == (2, 3, 16, 16, 3)


def test_sliding_windows_padding():
    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(5)]
    wins = list(sliding_windows(iter(frames), radius=1))
    assert len(wins) == 5
    # first window: (f0, f0, f1); middle frame of window i is frame i
    assert (wins[0][0] == 0).all() and (wins[0][1] == 0).all()
    for i, w in enumerate(wins):
        assert (w[1] == i).all()
    assert (wins[-1][2] == 4).all()  # last padded with final frame

    # single-frame video
    wins = list(sliding_windows(iter(frames[:1]), radius=1))
    assert len(wins) == 1 and all((f == 0).all() for f in wins[0])
