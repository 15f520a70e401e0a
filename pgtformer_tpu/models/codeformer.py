"""CodeFormer — single-image baseline (reference archs/codeformer_arch.py:200-366).

Kept for architecture-family parity: VQAutoEncoder backbone + 9-layer
transformer with a *learned* positional embedding + non-temporal Fuse-SFT
skips at fixed encoder/generator block indices.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.models.vqgan import (
    VectorQuantizer, _SeqTower, encoder_specs, generator_specs, ResBlock2D)
from pgtformer_tpu.nn.transformer import TransformerSALayer
from pgtformer_tpu.ops.image import adaptive_instance_normalization
from pgtformer_tpu.registry import ARCH_REGISTRY

Dtype = Any


class FuseSftBlock2D(nn.Module):
    """Non-temporal Fuse-SFT (reference codeformer_arch.py:200-226)."""
    in_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_feat, dec_feat, w: float = 1.0):
        feat = ResBlock2D(out_channels=self.out_ch, dtype=self.dtype,
                          name="encode_enc")(
            jnp.concatenate([enc_feat, dec_feat], axis=-1))

        def head(name):
            h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_0")(feat)
            h = nn.leaky_relu(h, 0.2)
            return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                           name=f"{name}_2")(h)

        scale = head("scale")
        shift = head("shift")
        return dec_feat + w * (dec_feat * scale + shift)


@ARCH_REGISTRY.register()
class CodeFormer(nn.Module):
    """Single-image CodeFormer (reference codeformer_arch.py:230-366)."""
    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    codebook_size: int = 1024
    latent_size: int = 256
    connect_list: Tuple[str, ...] = ("32", "64", "128", "256")
    img_size: int = 512
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    quantizer: str = "nearest"
    res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    emb_dim: int = 256
    w: float = 0.0
    detach_16: bool = True
    adain: bool = False
    last_silu: bool = False
    dtype: Dtype = jnp.float32

    # encoder tap / generator fuse block indices (reference :278-280)
    FUSE_ENCODER_BLOCK = {"512": 2, "256": 5, "128": 8, "64": 11,
                          "32": 14, "16": 18}
    FUSE_GENERATOR_BLOCK = {"16": 6, "32": 9, "64": 12, "128": 15,
                            "256": 18, "512": 21}
    CHANNELS = {"16": 512, "32": 256, "64": 256, "128": 128,
                "256": 128, "512": 64}

    def setup(self):
        self.encoder = _SeqTower(
            encoder_specs(3, self.nf, self.emb_dim, self.ch_mult,
                          self.res_blocks, self.img_size,
                          self.attn_resolutions, self.last_silu),
            dtype=self.dtype)
        self.quantize = VectorQuantizer(self.codebook_size, self.emb_dim,
                                        0.25, dtype=self.dtype)
        self.generator = _SeqTower(
            generator_specs(self.nf, self.emb_dim, self.ch_mult,
                            self.res_blocks, self.img_size,
                            self.attn_resolutions, self.last_silu),
            dtype=self.dtype)

        self.position_emb = self.param(
            "position_emb", nn.initializers.zeros,
            (self.latent_size, self.dim_embd), jnp.float32)
        self.feat_emb = nn.Dense(self.dim_embd, dtype=self.dtype,
                                 name="feat_emb")
        self.ft_layers = [TransformerSALayer(
            embed_dim=self.dim_embd, nhead=self.n_head,
            dim_mlp=self.dim_embd * 2, dtype=self.dtype,
            name=f"ft_layers_{i}") for i in range(self.n_layers)]
        self.idx_pred_norm = nn.LayerNorm(dtype=self.dtype,
                                          name="idx_pred_norm")
        self.idx_pred_head = nn.Dense(self.codebook_size, use_bias=False,
                                      dtype=self.dtype, name="idx_pred_head")
        self.fuse_convs_dict = {
            k: FuseSftBlock2D(self.CHANNELS[k], self.CHANNELS[k],
                              dtype=self.dtype, name=f"fuse_convs_{k}")
            for k in self.connect_list}

    def __call__(self, x: jnp.ndarray, w: Optional[float] = None,
                 detach_16: bool = True, code_only: bool = False,
                 adain: Optional[bool] = None):
        """x [N, H, W, 3] -> (out [N, H, W, 3], logits [N, hw, n], lq_feat)."""
        if w is None:
            w = self.w
        if adain is None:
            adain = self.adain
        N = x.shape[0]

        taps = tuple(self.FUSE_ENCODER_BLOCK[k] for k in self.connect_list)
        lq_feat, tapped = self.encoder(x, taps=taps)
        enc_feat_dict = {str(v.shape[-2]): v for v in tapped.values()}

        hh, ww, cc = lq_feat.shape[1:]
        tokens = self.feat_emb(lq_feat.reshape(N, hh * ww, cc))
        pos = self.position_emb[None].astype(tokens.dtype)
        for layer in self.ft_layers:
            tokens = layer(tokens, query_pos=pos)
        logits = self.idx_pred_head(self.idx_pred_norm(tokens))  # [N, hw, n]

        if code_only:
            return logits, lq_feat

        top_idx = jnp.argmax(logits, axis=-1)
        quant_feat = self.quantize.get_codebook_feat(
            top_idx, shape=(N, hh, ww, self.emb_dim))
        if detach_16:
            quant_feat = jax.lax.stop_gradient(quant_feat)
        if adain:
            quant_feat = adaptive_instance_normalization(quant_feat, lq_feat)

        hooks = None
        if w > 0:
            def make_hook(k):
                def hook(h):
                    enc = jax.lax.stop_gradient(enc_feat_dict[k])
                    return self.fuse_convs_dict[k](enc, h, w=w)
                return hook
            hooks = {self.FUSE_GENERATOR_BLOCK[k]: make_hook(k)
                     for k in self.connect_list}
        out = self.generator(quant_feat, hooks=hooks)
        return out, logits, lq_feat
