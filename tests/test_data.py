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


def _ref_degradations(reference):
    import sys, types
    ft = types.ModuleType("torchvision.transforms.functional_tensor")
    ft.rgb_to_grayscale = lambda x: x.mean(dim=-3, keepdim=True)
    sys.modules["torchvision.transforms.functional_tensor"] = ft
    sys.modules["torchvision.transforms"].functional_tensor = ft
    from data import degradations as ref_D
    return ref_D


def test_noise_wrappers_match_reference_streams(reference):
    """generate/add gaussian+poisson noise reproduce the reference
    bit-exactly when fed the same legacy RandomState stream
    (reference data/degradations.py:391-683)."""
    ref_D = _ref_degradations(reference)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)

    np.random.seed(123)
    ref_n = ref_D.generate_gaussian_noise(img, sigma=25, gray_noise=False)
    mine = D.generate_gaussian_noise(img, np.random.RandomState(123), 25)
    np.testing.assert_array_equal(mine, ref_n)

    np.random.seed(7)
    ref_n = ref_D.generate_poisson_noise(img, scale=1.3, gray_noise=False)
    mine = D.generate_poisson_noise(img, np.random.RandomState(7), 1.3)
    np.testing.assert_array_equal(mine, ref_n)

    for clip, rounds in [(True, False), (True, True), (False, True)]:
        np.random.seed(5)
        ref_o = ref_D.add_gaussian_noise(img, sigma=40, clip=clip,
                                         rounds=rounds)
        mine = D.add_gaussian_noise(img, np.random.RandomState(5), 40,
                                    clip=clip, rounds=rounds)
        np.testing.assert_array_equal(mine, ref_o)

        np.random.seed(11)
        ref_o = ref_D.add_poisson_noise(img, scale=0.7, clip=clip,
                                        rounds=rounds)
        mine = D.add_poisson_noise(img, np.random.RandomState(11), 0.7,
                                   clip=clip, rounds=rounds)
        np.testing.assert_array_equal(mine, ref_o)

    # random_* wrappers: same draw order (param uniforms then noise)
    np.random.seed(21)
    ref_o = ref_D.random_add_gaussian_noise(img, sigma_range=(5, 30),
                                            gray_prob=0)
    mine = D.random_add_gaussian_noise(img, np.random.RandomState(21),
                                       sigma_range=(5, 30), gray_prob=0)
    np.testing.assert_array_equal(mine, ref_o)

    np.random.seed(22)
    ref_o = ref_D.random_add_poisson_noise(img, scale_range=(0.1, 2.0),
                                           gray_prob=0)
    mine = D.random_add_poisson_noise(img, np.random.RandomState(22),
                                      scale_range=(0.1, 2.0), gray_prob=0)
    np.testing.assert_array_equal(mine, ref_o)


def test_gray_noise_is_channelwise_identical():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    n = D.generate_gaussian_noise(img, np.random.default_rng(1), 30,
                                  gray=True)
    np.testing.assert_array_equal(n[..., 0], n[..., 1])
    np.testing.assert_array_equal(n[..., 0], n[..., 2])
    n = D.generate_poisson_noise(img, np.random.default_rng(2), 1.0,
                                 gray=True)
    np.testing.assert_array_equal(n[..., 0], n[..., 1])
    # random wrappers honor gray_prob=1
    out = D.random_add_gaussian_noise(img, np.random.default_rng(4),
                                      sigma_range=(20, 20), gray_prob=1.0,
                                      clip=False)
    d = out - img
    np.testing.assert_allclose(d[..., 0], d[..., 1], atol=1e-7)


def test_batched_jax_noise_variants():
    """On-device batch noise (the torch `_pt` analog): per-sample params,
    gray blending, Poisson vals == len(unique) of the quantized image."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))

    # unique-levels histogram == np.unique on the quantized image
    q = jnp.clip(jnp.round(img * 255.0), 0, 255)
    lv = np.asarray(D._unique_levels_batch(q))
    for b in range(2):
        assert lv[b] == len(np.unique(np.asarray(q[b])))

    key = jax.random.PRNGKey(0)
    out = D.add_gaussian_noise_batch(img, key, sigma=jnp.asarray([20., 0.]),
                                     clip=False)
    d = np.asarray(out - img)
    assert abs(d[0].std() - 20 / 255) < 2e-3
    np.testing.assert_array_equal(d[1], 0.0)

    # gray: channels identical for the gray sample only
    out = D.add_gaussian_noise_batch(img, key, sigma=15.0,
                                     gray_noise=jnp.asarray([1.0, 0.0]),
                                     clip=False)
    d = np.asarray(out - img)
    # (img + n) - img re-rounds per channel; equality is float32-eps level
    np.testing.assert_allclose(d[0, ..., 0], d[0, ..., 1], atol=1e-6)
    assert np.abs(d[1, ..., 0] - d[1, ..., 1]).max() > 1e-4

    # rounds quantizes to the 255 grid
    out = D.random_add_gaussian_noise_batch(img, key, sigma_range=(5, 25),
                                            rounds=True)
    o = np.asarray(out) * 255.0
    np.testing.assert_allclose(o, np.round(o), atol=1e-4)

    # poisson: intensity-dependent noise, finite, shaped right
    out = D.random_add_poisson_noise_batch(img, key, scale_range=(0.5, 1.5),
                                           gray_prob=0.5)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(img)).mean() > 1e-4


def test_blind_degrade_second_order_and_sinc():
    rng0 = np.random.default_rng(9)
    frames = rng0.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    # force every optional stage on; still deterministic + in-range
    a = D.blind_degrade_clip(frames, np.random.default_rng(42),
                             sinc_prob=1.0, gray_noise_prob=1.0,
                             poisson_prob=1.0, second_order_prob=1.0,
                             final_sinc_prob=1.0)
    b = D.blind_degrade_clip(frames, np.random.default_rng(42),
                             sinc_prob=1.0, gray_noise_prob=1.0,
                             poisson_prob=1.0, second_order_prob=1.0,
                             final_sinc_prob=1.0)
    np.testing.assert_array_equal(a, b)
    assert a.shape == frames.shape
    assert 0.0 <= a.min() and a.max() <= 1.0
    assert np.abs(a - frames).mean() > 1e-3


def test_loader_reseed_dataset_redraws_degradations(vfhq_root):
    """reseed_dataset=True must redraw per-index randomness (degradation,
    hflip) each epoch — matching the reference's global-RNG torch datasets
    — while gt content (modulo hflip) and determinism-within-epoch hold."""
    from pgtformer_tpu.data.loader import PrefetchLoader

    ds = VFHQTrainDataset(vfhq_root, r=1, degradation="blr", seed=5,
                          use_hflip=False)
    ld = PrefetchLoader(ds, 1, shuffle=False, num_workers=0, backend="sync",
                        reseed_dataset=True, keys=("gt", "lq"))
    e0 = next(iter(ld))
    e1 = next(iter(ld))
    # same frame window, same gt; fresh degradation draw on lq
    np.testing.assert_array_equal(e0["gt"], e1["gt"])
    assert np.abs(e0["lq"] - e1["lq"]).mean() > 1e-5

    ds2 = VFHQTrainDataset(vfhq_root, r=1, degradation="blr", seed=5,
                           use_hflip=False)
    ld2 = PrefetchLoader(ds2, 1, shuffle=False, num_workers=0,
                         backend="sync", reseed_dataset=False,
                         keys=("gt", "lq"))
    f0 = next(iter(ld2))
    f1 = next(iter(ld2))
    # default behavior unchanged: frozen per-index draws across epochs
    np.testing.assert_array_equal(f0["lq"], f1["lq"])
    np.testing.assert_array_equal(f0["lq"], e0["lq"])
