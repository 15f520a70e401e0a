"""3D (temporal-window) Video-Swin layer.

Re-implementation of the Video Swin stack the reference consumes from
modules/swin.py (only `BasicLayer` is used — by TDRQVAE's latent-space
temporal mixing, reference tdrqvae_arch.py:834-835,843-861).  True 3D
windows (Wd, Wh, Ww) over [B, T, H, W, C], fused-qkv attention with 3D
relative position bias, alternating-shift stacks.

As elsewhere: masks and bias indices are NumPy trace-time constants.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def window_partition_3d(x: jnp.ndarray, win: Tuple[int, int, int]
                        ) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B*nW, Wd*Wh*Ww, C] (reference swin.py:38-49)."""
    B, D, H, W, C = x.shape
    wd, wh, ww = win
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_reverse_3d(windows: jnp.ndarray, win: Tuple[int, int, int],
                      B: int, D: int, H: int, W: int) -> jnp.ndarray:
    wd, wh, ww = win
    C = windows.shape[-1]
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index_3d(win: Tuple[int, int, int]) -> np.ndarray:
    """[N, N] indices into a (2Wd-1)(2Wh-1)(2Ww-1) bias table
    (reference swin.py:112-126)."""
    wd, wh, ww = win
    dd, hh, wwx = np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                              indexing="ij")
    coords = np.stack([dd.ravel(), hh.ravel(), wwx.ravel()])   # [3, N]
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def compute_mask_3d(Dp: int, Hp: int, Wp: int, win: Tuple[int, int, int],
                    shift: Tuple[int, int, int]) -> np.ndarray:
    """[nW, N, N] additive SW-MSA mask (reference swin.py:312-325)."""
    img = np.zeros((Dp, Hp, Wp), np.float32)
    cnt = 0
    for d in (slice(None, -win[0]), slice(-win[0], -shift[0] or None),
              slice(-shift[0] if shift[0] else 0, None)):
        for h in (slice(None, -win[1]), slice(-win[1], -shift[1] or None),
                  slice(-shift[1] if shift[1] else 0, None)):
            for w in (slice(None, -win[2]), slice(-win[2], -shift[2] or None),
                      slice(-shift[2] if shift[2] else 0, None)):
                img[d, h, w] = cnt
                cnt += 1
    m = window_partition_3d(jnp.asarray(img[None, ..., None]), win)
    m = np.asarray(m)[..., 0]                         # [nW, N]
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


class WindowAttention3DFused(nn.Module):
    """Fused-qkv 3D window attention with relative position bias
    (reference swin.py:85-170; qkv_bias default False)."""
    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        Bn, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = self.qk_scale or hd ** -0.5
        wd, wh, ww = self.window_size
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h),
                           jnp.float32)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = (qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:])
        q = q.reshape(Bn, N, h, hd) * scale
        k = k.reshape(Bn, N, h, hd)
        v = v.reshape(Bn, N, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        idx = relative_position_index_3d(tuple(self.window_size))
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = (attn.reshape(Bn // nW, nW, h, N, N)
                    + jnp.asarray(mask, attn.dtype)[None, :, None])
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(Bn, N, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinTransformerBlock3D(nn.Module):
    """LN -> (3D shift) -> W-MSA -> LN -> MLP (reference swin.py:173-276)."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        win = list(self.window_size)
        shift = list(self.shift_size)
        for i, s in enumerate((D, H, W)):
            if s <= win[i]:
                win[i] = s
                shift[i] = 0
        win, shift = tuple(win), tuple(shift)

        pads = [(-d) % w for d, w in zip((D, H, W), win)]
        Dp, Hp, Wp = D + pads[0], H + pads[1], W + pads[2]
        mask = (compute_mask_3d(Dp, Hp, Wp, win, shift)
                if any(s > 0 for s in shift) else None)

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if any(pads):
            x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]),
                            (0, pads[2]), (0, 0)))
        if mask is not None:
            x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
        xw = window_partition_3d(x, win)
        xw = WindowAttention3DFused(
            dim=C, window_size=win, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, dtype=self.dtype, name="attn")(xw, mask)
        x = window_reverse_3d(xw, win, B, Dp, Hp, Wp)
        if mask is not None:
            x = jnp.roll(x, (shift[0], shift[1], shift[2]), axis=(1, 2, 3))
        if any(pads):
            x = x[:, :D, :H, :W, :]
        x = shortcut + x

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class BasicLayer3D(nn.Module):
    """Alternating-shift stack of 3D swin blocks (reference swin.py:328-409).
    I/O: [B, T, H, W, C] (channels-last, unlike the reference's B,C,D,H,W)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (1, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            x = SwinTransformerBlock3D(
                dim=self.dim, num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=(0, 0, 0) if i % 2 == 0 else half,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                dtype=self.dtype, name=f"blocks_{i}")(x)
        if self.downsample:
            x = PatchMerging3D(dim=self.dim, dtype=self.dtype,
                               name="downsample")(x)
        return x


class PatchMerging3D(nn.Module):
    """2x2 spatial patch merging (reference swin.py:279-309)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class PatchEmbed3D(nn.Module):
    """Video-to-patch embedding via strided 3D conv
    (reference swin.py:412-...).  I/O [B, T, H, W, C] -> patch tokens."""
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    use_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pd, ph, pw = self.patch_size
        B, D, H, W, C = x.shape
        pads = ((0, (-D) % pd), (0, (-H) % ph), (0, (-W) % pw))
        if any(p[1] for p in pads):
            x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
        x = nn.Conv(self.embed_dim, (pd, ph, pw), strides=(pd, ph, pw),
                    padding="VALID", dtype=self.dtype, name="proj")(x)
        if self.use_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class SwinTransformer3D(nn.Module):
    """Video Swin trunk: PatchEmbed3D + staged BasicLayer3D pyramid
    (reference swin.py SwinTransformer3D; only `BasicLayer` is consumed by
    the deployed models — kept for component parity)."""
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = PatchEmbed3D(self.patch_size, self.embed_dim, use_norm=True,
                         dtype=self.dtype, name="patch_embed")(x)
        n = len(self.depths)
        for i in range(n):
            x = BasicLayer3D(
                dim=int(self.embed_dim * 2 ** i), depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=tuple(self.window_size),
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                downsample=i < n - 1, dtype=self.dtype,
                name=f"layers_{i}")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)
