"""Misc reusable blocks from the reference's module zoo that the deployed
model does not consume but the component inventory lists
(reference modules/rstt_layers.py:28-53, 116-132, 665-751, 915-937).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.nn.blocks import ResnetBlock

Dtype = Any


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv residual block without normalization
    (reference rstt_layers.py:35-53)."""
    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class InputProj(nn.Module):
    """Per-frame conv + LeakyReLU video input projection
    (reference rstt_layers.py:665-709).  I/O [B, T, H, W, C]."""
    embed_dim: int = 32
    kernel_size: int = 3
    stride: int = 1
    use_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        k = self.kernel_size
        h = nn.Conv(self.embed_dim, (k, k), strides=(self.stride,) * 2,
                    padding=k // 2, dtype=self.dtype, name="proj")(h)
        h = nn.leaky_relu(h, 0.01)
        if self.use_norm:
            h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        return h.reshape(B, T, *h.shape[1:])


class SResBlock(nn.Module):
    """Sequential per-frame resblock stack (reference rstt_layers.py:915-937)."""
    num_res_blocks: int
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        for i in range(self.num_res_blocks):
            h = ResnetBlock(out_channels=self.out_channels,
                            dtype=self.dtype, name=f"mid_{i}")(h)
        return h.reshape(B, T, *h.shape[1:])


class StridedDownsample(nn.Module):
    """k4 s2 conv downsample on [B, T, H, W, C]
    (reference rstt_layers.py:711-730)."""
    out_chans: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = nn.Conv(self.out_chans, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv")(x.reshape(B * T, H, W, C))
        return h.reshape(B, T, H // 2, W // 2, -1)


class TransposedUpsample(nn.Module):
    """k2 s2 transposed-conv upsample on [B, T, H, W, C]
    (reference rstt_layers.py:732-751)."""
    out_chans: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = nn.ConvTranspose(self.out_chans, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="deconv")(
            x.reshape(B * T, H, W, C))
        return h.reshape(B, T, H * 2, W * 2, -1)
