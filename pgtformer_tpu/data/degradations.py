"""Blind-degradation synthesis (host-side, NumPy).

Fresh implementation of the classic blind face-restoration degradation
pipeline the reference ships (reference data/degradations.py, itself copied
from VQFR): random blur kernels (iso/aniso Gaussian, generalized Gaussian,
plateau, sinc), Gaussian/Poisson noise with optional gray noise, JPEG
compression, and MATLAB-compatible bicubic rescaling.

Design deltas:
  * every sampler takes an explicit `np.random.Generator` — deterministic
    per-sample randomness (the reference uses global `np.random`/`random`
    state, which breaks reproducibility across worker processes);
  * pure NumPy + cv2; per-clip application keeps the same kernel/noise
    across the T frames of a clip when `shared` (temporal consistency).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# -- blur kernels -----------------------------------------------------------

def sigma_matrix(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """Rotated 2x2 covariance matrix."""
    d = np.array([[sig_x ** 2, 0.0], [0.0, sig_y ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def mesh_grid(kernel_size: int) -> np.ndarray:
    """[k, k, 2] grid of (x, y) coordinates centered at 0."""
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], axis=-1)


def bivariate_gaussian(kernel_size: int, sig_x: float, sig_y: float = None,
                       theta: float = 0.0, isotropic: bool = True
                       ) -> np.ndarray:
    grid = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0.0], [0.0, sig_x ** 2]])
    else:
        sigma = sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    k = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", grid, inv, grid))
    return k / k.sum()


def bivariate_generalized_gaussian(kernel_size: int, sig_x: float,
                                   sig_y: float = None, theta: float = 0.0,
                                   beta: float = 1.0,
                                   isotropic: bool = True) -> np.ndarray:
    grid = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0.0], [0.0, sig_x ** 2]])
    else:
        sigma = sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    q = np.einsum("hwi,ij,hwj->hw", grid, inv, grid)
    k = np.exp(-0.5 * np.power(q, beta))
    return k / k.sum()


def bivariate_plateau(kernel_size: int, sig_x: float, sig_y: float = None,
                      theta: float = 0.0, beta: float = 1.0,
                      isotropic: bool = True) -> np.ndarray:
    grid = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0.0], [0.0, sig_x ** 2]])
    else:
        sigma = sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    q = np.einsum("hwi,ij,hwj->hw", grid, inv, grid)
    k = 1.0 / (np.power(q, beta) + 1.0)
    return k / k.sum()


def circular_lowpass_kernel(cutoff: float, kernel_size: int,
                            pad_to: int = 0) -> np.ndarray:
    """2D sinc filter (ideal circular low-pass); kernel_size must be odd."""
    from scipy import special
    assert kernel_size % 2 == 1
    grid = mesh_grid(kernel_size)
    r = np.sqrt(grid[..., 0] ** 2 + grid[..., 1] ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * special.j1(cutoff * r) / (2 * np.pi * r)
    k[kernel_size // 2, kernel_size // 2] = cutoff ** 2 / (4 * np.pi)
    k = k / k.sum()
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        k = np.pad(k, ((pad, pad), (pad, pad)))
    return k


def random_mixed_kernel(rng: np.random.Generator,
                        kernel_size: int = 21,
                        kernel_list: Sequence[str] = (
                            "iso", "aniso", "generalized_iso",
                            "generalized_aniso", "plateau_iso",
                            "plateau_aniso"),
                        kernel_prob: Sequence[float] = (
                            0.405, 0.225, 0.108, 0.027, 0.108, 0.027),
                        sigma_x_range: Tuple[float, float] = (0.2, 3.0),
                        sigma_y_range: Tuple[float, float] = (0.2, 3.0),
                        rotation_range: Tuple[float, float] = (-math.pi,
                                                               math.pi),
                        betag_range: Tuple[float, float] = (0.5, 4.0),
                        betap_range: Tuple[float, float] = (1.0, 2.0),
                        ) -> np.ndarray:
    """Sample one blur kernel from the kernel-type mixture."""
    kind = rng.choice(list(kernel_list), p=np.asarray(kernel_prob)
                      / np.sum(kernel_prob))
    sx = rng.uniform(*sigma_x_range)
    sy = rng.uniform(*sigma_y_range)
    th = rng.uniform(*rotation_range)
    if kind == "iso":
        return bivariate_gaussian(kernel_size, sx, isotropic=True)
    if kind == "aniso":
        return bivariate_gaussian(kernel_size, sx, sy, th, isotropic=False)
    if kind == "generalized_iso":
        return bivariate_generalized_gaussian(
            kernel_size, sx, beta=rng.uniform(*betag_range), isotropic=True)
    if kind == "generalized_aniso":
        return bivariate_generalized_gaussian(
            kernel_size, sx, sy, th, beta=rng.uniform(*betag_range),
            isotropic=False)
    if kind == "plateau_iso":
        return bivariate_plateau(kernel_size, sx,
                                 beta=rng.uniform(*betap_range),
                                 isotropic=True)
    if kind == "plateau_aniso":
        return bivariate_plateau(kernel_size, sx, sy, th,
                                 beta=rng.uniform(*betap_range),
                                 isotropic=False)
    raise ValueError(kind)


# -- noise ------------------------------------------------------------------

def add_gaussian_noise(img: np.ndarray, rng: np.random.Generator,
                       sigma: float, gray: bool = False,
                       clip: bool = True) -> np.ndarray:
    """img float [H, W, C] in [0,1]; sigma on the 0-255 scale / 255."""
    if gray:
        noise = rng.normal(size=img.shape[:2])[..., None] * sigma
    else:
        noise = rng.normal(size=img.shape) * sigma
    out = img + noise.astype(img.dtype)
    return np.clip(out, 0, 1) if clip else out


def add_poisson_noise(img: np.ndarray, rng: np.random.Generator,
                      scale: float = 1.0, gray: bool = False,
                      clip: bool = True) -> np.ndarray:
    """Shot noise with intensity-dependent variance."""
    src = img.mean(-1, keepdims=True) if gray else img
    vals = 2 ** np.ceil(np.log2(len(np.unique((src * 255).astype(np.uint8)))))
    vals = max(vals, 2.0)
    noisy = rng.poisson(np.clip(src, 0, 1) * vals) / vals
    noise = (noisy - src) * scale
    out = img + noise.astype(img.dtype)
    return np.clip(out, 0, 1) if clip else out


def add_jpeg_compression(img: np.ndarray, quality: int) -> np.ndarray:
    """Round-trip through JPEG at the given quality (img float [0,1] RGB)."""
    if cv2 is None:
        raise RuntimeError("cv2 required for JPEG compression")
    u8 = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8[..., ::-1],
                           [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    assert ok
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    return dec.astype(np.float32) / 255.0


# -- MATLAB-compatible bicubic resize --------------------------------------

def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    return ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2)))


def _resize_weights(in_len: int, out_len: int, scale: float):
    kernel_width = 4.0
    if scale < 1:
        kernel_width /= scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :] - 1
    dist = u[:, None] - idx - 1
    if scale < 1:
        w = scale * _cubic(dist * scale)
    else:
        w = _cubic(dist)
    w = w / w.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, in_len - 1).astype(np.int64)
    keep = ~np.all(w == 0, axis=0)
    return w[:, keep], idx[:, keep]


def imresize_matlab(img: np.ndarray, scale: float) -> np.ndarray:
    """MATLAB `imresize` (bicubic, antialiasing) on float [H, W, C].

    Matches BasicSR's `matlab_functions.imresize`, which the reference uses
    for the 'lr' x0.25 degradation (reference data/vfhq_full_dataset.py:207).
    """
    H, W = img.shape[:2]
    out_h, out_w = int(np.ceil(H * scale)), int(np.ceil(W * scale))
    wh, ih = _resize_weights(H, out_h, scale)
    ww, iw = _resize_weights(W, out_w, scale)
    # rows
    tmp = (img[ih] * wh[..., None, None]).sum(axis=1)      # [out_h, W, C]
    out = (tmp[:, iw] * ww[None, :, :, None]).sum(axis=2)  # [out_h, out_w, C]
    return out.astype(img.dtype)


# -- the classic pipeline ---------------------------------------------------

def blind_degrade_clip(frames: np.ndarray, rng: np.random.Generator,
                       downscale_range: Tuple[float, float] = (1.0, 8.0),
                       sigma_range: Tuple[float, float] = (0.0, 10.0),
                       jpeg_range: Tuple[int, int] = (60, 100),
                       kernel_size: int = 21,
                       shared: bool = True) -> np.ndarray:
    """blur -> downsample -> noise -> JPEG -> upsample back, applied with
    shared random draws across the clip for temporal consistency.

    frames: [T, H, W, 3] float in [0, 1]; returns same shape.
    """
    T, H, W, _ = frames.shape
    kernel = random_mixed_kernel(rng, kernel_size)
    scale = rng.uniform(*downscale_range)
    sigma = rng.uniform(*sigma_range) / 255.0
    quality = int(rng.integers(jpeg_range[0], jpeg_range[1] + 1))
    noise_rng = rng if shared else None

    out = []
    for t in range(T):
        img = frames[t]
        img = cv2.filter2D(img, -1, kernel)
        small = cv2.resize(img, (int(W / scale), int(H / scale)),
                           interpolation=cv2.INTER_LINEAR)
        r = noise_rng if noise_rng is not None else np.random.default_rng(
            rng.integers(0, 2 ** 31))
        small = add_gaussian_noise(small, r, sigma)
        small = add_jpeg_compression(small, quality)
        img = cv2.resize(small, (W, H), interpolation=cv2.INTER_LINEAR)
        out.append(img)
    return np.stack(out).astype(np.float32)
