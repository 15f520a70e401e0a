"""Global (dense) transformer layers for code-token prediction.

Re-implements the pre-norm transformer layer the reference takes from
CodeFormer (reference archs/codeformer_arch.py:102-137 `TransformerSALayer`,
built on torch.nn.MultiheadAttention), in batch-first [B, N, C] layout.

The 9-layer stack runs over T*32*32 = 3072 tokens at C=512 — large, dense,
MXU-friendly matmuls; no windowing needed here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class MultiHeadSelfAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (packed qkv weights).

    Parameters are stored packed ([C, 3C] kernel / [3C] bias) so the weight
    converter can copy torch's `in_proj_weight`/`in_proj_bias` verbatim.

    With `use_pallas` (inference on TPU), the softmax(qk^T)v core runs in
    the VMEM-resident kernel (ops/flash_attn.py) instead of materializing
    the [B, H, N, N] fp32 scores in HBM.
    """
    embed_dim: int
    num_heads: int
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 v: jnp.ndarray) -> jnp.ndarray:
        C = self.embed_dim
        h = self.num_heads
        hd = C // h
        B, Nq, _ = q.shape
        Nk = k.shape[1]

        in_kernel = self.param("in_proj_kernel",
                               nn.initializers.xavier_uniform(), (C, 3 * C),
                               jnp.float32)
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,),
                             jnp.float32)
        kern = in_kernel.astype(self.dtype)
        bias = in_bias.astype(self.dtype)

        if q is k:
            # self-attention with q == k (the deployed path: q = k = x+pos):
            # one packed matmul for both projections
            qkp = q @ kern[:, :2 * C] + bias[:2 * C]
            qp, kp = qkp[..., :C], qkp[..., C:]
        else:
            qp = q @ kern[:, :C] + bias[:C]
            kp = k @ kern[:, C:2 * C] + bias[C:2 * C]
        vp = v @ kern[:, 2 * C:] + bias[2 * C:]

        scale = hd ** -0.5
        if (self.use_pallas and not self.is_initializing()
                and Nq == Nk and Nq % 8 == 0):
            from pgtformer_tpu.ops.flash_attn import dense_mha
            # NOTE: the transpose-free "bnhd" kernel layout exists
            # (ops/flash_attn.py) but its per-head 64-lane 4D reads hit
            # Mosaic's pathological-compile path (>30 min); the explicit
            # head transpose costs ~0.2 ms/copy and compiles in seconds.
            to_heads = lambda a, N: a.reshape(B, N, h, hd).transpose(
                (0, 2, 1, 3))
            out = dense_mha(to_heads(qp, Nq), to_heads(kp, Nk),
                            to_heads(vp, Nk), scale=scale,
                            block_q=1024)
            out = out.transpose((0, 2, 1, 3)).reshape(B, Nq, C)
            out = out.astype(self.dtype)
        else:
            qp = qp.reshape(B, Nq, h, hd) * scale
            kp = kp.reshape(B, Nk, h, hd)
            vp = vp.reshape(B, Nk, h, hd)

            attn = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp,
                             preferred_element_type=jnp.float32)
            out = out.reshape(B, Nq, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class PositionEmbeddingSine(nn.Module):
    """Sinusoidal 2D positional embedding (reference codeformer_arch.py:49-89;
    defined-but-unused there, kept for component parity).
    I/O: [N, H, W, C] -> [N, H, W, 2*num_pos_feats]."""
    num_pos_feats: int = 64
    temperature: float = 10000.0
    normalize: bool = False
    scale: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import numpy as np
        N, H, W, _ = x.shape
        scale = self.scale or (2 * np.pi)
        y_embed = np.cumsum(np.ones((H, W), np.float32), axis=0)
        x_embed = np.cumsum(np.ones((H, W), np.float32), axis=1)
        if self.normalize:
            eps = 1e-6
            y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
            x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
        dim_t = np.arange(self.num_pos_feats, dtype=np.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t
        pos_x = np.stack([np.sin(pos_x[..., 0::2]),
                          np.cos(pos_x[..., 1::2])], -1).reshape(H, W, -1)
        pos_y = np.stack([np.sin(pos_y[..., 0::2]),
                          np.cos(pos_y[..., 1::2])], -1).reshape(H, W, -1)
        pos = np.concatenate([pos_y, pos_x], axis=-1)
        return jnp.broadcast_to(jnp.asarray(pos, x.dtype), (N, H, W,
                                                            pos.shape[-1]))


class TransformerCALayer(nn.Module):
    """Pre-norm cross-attention layer with weighted residual (reference
    codeformer_arch.py:141-183; unused by the deployed model)."""
    embed_dim: int
    nhead: int = 8
    dim_mlp: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgta: jnp.ndarray, tgtb: jnp.ndarray, w: float = 1.0,
                 query_pos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        a = norm1(tgta)
        b = norm1(tgtb)
        q = a if query_pos is None else a + query_pos
        k = b if query_pos is None else b + query_pos
        attn_out = MultiHeadSelfAttention(
            embed_dim=self.embed_dim, num_heads=self.nhead, dtype=self.dtype,
            name="self_attn")(q, k, b)
        tgt = tgta + attn_out * w

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        x = nn.Dense(self.dim_mlp, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear2")(x)
        return tgt + x


class TransformerSALayer(nn.Module):
    """Pre-norm self-attention layer with positional query injection
    (reference codeformer_arch.py:102-137; gelu FFN, q=k=x+pos, v=x)."""
    embed_dim: int
    nhead: int = 8
    dim_mlp: int = 2048
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray,
                 query_pos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        qk = x if query_pos is None else x + query_pos
        attn_out = MultiHeadSelfAttention(
            embed_dim=self.embed_dim, num_heads=self.nhead,
            use_pallas=self.use_pallas, dtype=self.dtype,
            name="self_attn")(qk, qk, x)
        tgt = tgt + attn_out

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        x = nn.Dense(self.dim_mlp, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear2")(x)
        return tgt + x
