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
    """
    embed_dim: int
    num_heads: int
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

        qp = q @ kern[:, :C] + bias[:C]
        kp = k @ kern[:, C:2 * C] + bias[C:2 * C]
        vp = v @ kern[:, 2 * C:] + bias[2 * C:]

        qp = qp.reshape(B, Nq, h, hd) * (hd ** -0.5)
        kp = kp.reshape(B, Nk, h, hd)
        vp = vp.reshape(B, Nk, h, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, Nq, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class TransformerSALayer(nn.Module):
    """Pre-norm self-attention layer with positional query injection
    (reference codeformer_arch.py:102-137; gelu FFN, q=k=x+pos, v=x)."""
    embed_dim: int
    nhead: int = 8
    dim_mlp: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray,
                 query_pos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        qk = x if query_pos is None else x + query_pos
        attn_out = MultiHeadSelfAttention(
            embed_dim=self.embed_dim, num_heads=self.nhead, dtype=self.dtype,
            name="self_attn")(qk, qk, x)
        tgt = tgt + attn_out

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        x = nn.Dense(self.dim_mlp, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear2")(x)
        return tgt + x
