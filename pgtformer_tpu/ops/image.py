"""Image-space ops: normalization, AdaIN, resize kernels.

All resizes here reproduce the exact sampling semantics the reference relies
on (PyTorch `F.interpolate` nearest / bilinear-align-corners), implemented as
static gathers + lerps that XLA fuses; shapes are always static.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

# ImageNet statistics used to feed the BiSeNet parser
# (reference pgtformer_arch.py:554-556).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize [..., C=3] images in [0,1] with ImageNet statistics."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def adaptive_instance_normalization(content: jnp.ndarray,
                                    style: jnp.ndarray,
                                    eps: float = 1e-5) -> jnp.ndarray:
    """AdaIN on channels-last [B, H, W, C] feature maps.

    Matches reference codeformer_arch.py:15-46 (per-sample, per-channel
    spatial mean/std; torch `.var` uses the unbiased estimator, reproduced
    here via ddof=1).
    """
    B, H, W, C = content.shape

    def stats(f):
        flat = f.reshape(B, H * W, C)
        mean = flat.mean(axis=1, keepdims=True)
        var = flat.var(axis=1, keepdims=True, ddof=1) + eps
        return mean.reshape(B, 1, 1, C), jnp.sqrt(var).reshape(B, 1, 1, C)

    c_mean, c_std = stats(content)
    s_mean, s_std = stats(style)
    return (content - c_mean) / c_std * s_std + s_mean


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """PyTorch-compatible `F.interpolate(mode='nearest')` on [..., H, W, C]."""
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    rows = np.floor(np.arange(oh) * (H / oh)).astype(np.int32)
    cols = np.floor(np.arange(ow) * (W / ow)).astype(np.int32)
    return x[..., rows, :, :][..., :, cols, :]


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample of [..., H, W, C] via repeat (free-ish on TPU)."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  out_hw: Tuple[int, int]) -> jnp.ndarray:
    """PyTorch `F.interpolate(mode='bilinear', align_corners=True)`.

    Used by the BiSeNet head at reference pgtformer_arch.py:375-376.
    Operates on [..., H, W, C]; static output size.
    """
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x

    def axis_weights(n_in, n_out):
        if n_out == 1:
            src = np.zeros(1)
        else:
            src = np.arange(n_out) * ((n_in - 1) / (n_out - 1))
        lo = np.floor(src).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1).astype(np.int32)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(H, oh)
    xlo, xhi, xf = axis_weights(W, ow)
    yf = jnp.asarray(yf, x.dtype)[:, None, None]   # broadcast over [oh, W, C]
    xf = jnp.asarray(xf, x.dtype)[:, None]         # broadcast over [ow, C]

    top = x[..., ylo, :, :]
    bot = x[..., yhi, :, :]
    rows = top * (1 - yf) + bot * yf           # [..., oh, W, C]
    left = rows[..., :, xlo, :]
    right = rows[..., :, xhi, :]
    return left * (1 - xf) + right * xf        # [..., oh, ow, C]


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool on [..., H, W, C] -> [..., 1, 1, C]
    (reference `F.avg_pool2d(feat, feat.size()[2:])`)."""
    return x.mean(axis=(-3, -2), keepdims=True)
