"""RQVAE — frame-wise (2D) residual-quantized VQGAN
(reference archs/rqvae_arch.py:579-931).

Same tower layout as TDCRQVAE3 but with per-image ResnetBlocks and dense
single-head AttnBlocks instead of spatio-temporal window attention.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.config import DDConfig, VQVAEConfig
from pgtformer_tpu.nn.blocks import ResnetBlock, Upsample, Downsample, group_norm
from pgtformer_tpu.models.vqgan import AttnBlock2D
from pgtformer_tpu.models.quantizer import RQBottleneck
from pgtformer_tpu.registry import ARCH_REGISTRY

Dtype = Any


class Encoder2D(nn.Module):
    """2D conv/attn encoder (reference rqvae_arch.py:579-672).
    I/O: [N, H, W, C_in] -> [N, H/2^L, W/2^L, z_channels]."""
    cfg: DDConfig
    checkpointing: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_multi_res_feats: bool = False):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        feats: List[jnp.ndarray] = []
        curr_res = cfg.resolution
        for i_level in range(cfg.num_resolutions):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            has_attn = curr_res in cfg.attn_resolutions
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(out_channels=block_out, dropout=cfg.dropout,
                                dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h)
                if has_attn:
                    h = AttnBlock2D(dtype=self.dtype,
                                    name=f"down_{i_level}_attn_{i_block}")(h)
            feats.append(h)
            if i_level != cfg.num_resolutions - 1:
                h = Downsample(with_conv=cfg.resamp_with_conv,
                               dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_1")(h)
        h = AttnBlock2D(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_2")(h)

        h = group_norm(self.dtype, "norm_out")(h)
        h = jax.nn.silu(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(out_c, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        if return_multi_res_feats:
            return h, feats
        return h


class Decoder2D(nn.Module):
    """2D decoder (reference rqvae_arch.py:675-776)."""
    cfg: DDConfig
    give_pre_end: bool = False
    checkpointing: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_1")(h)
        h = AttnBlock2D(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                        name="mid_block_2")(h)

        for i_level in reversed(range(cfg.num_resolutions)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            has_attn = curr_res in cfg.attn_resolutions
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_channels=block_out, dropout=cfg.dropout,
                                dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h)
                if has_attn:
                    h = AttnBlock2D(dtype=self.dtype,
                                    name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(with_conv=cfg.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = group_norm(self.dtype, "norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


@ARCH_REGISTRY.register()
class RQVAE(nn.Module):
    """2D image RQ-VAE (reference rqvae_arch.py:779-931)."""
    cfg: VQVAEConfig
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        assert cfg.loss_type in ("mse", "l1")
        self.encoder = Encoder2D(cfg.ddconfig, dtype=self.dtype)
        self.decoder = Decoder2D(cfg.ddconfig, dtype=self.dtype)
        self.quantizer = RQBottleneck(
            latent_shape=cfg.latent_shape, code_shape=cfg.code_shape,
            n_embed=cfg.n_embed, decay=cfg.decay,
            shared_codebook=cfg.shared_codebook,
            restart_unused_codes=cfg.restart_unused_codes,
            axis_name=self.axis_name, dtype=self.dtype)
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.ddconfig.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def __call__(self, x: jnp.ndarray, code_only: bool = False,
                 train: bool = False):
        """x [N, H, W, 3] -> (recon, quant_loss, codes)."""
        z_e = self.encode(x)
        z_q, quant_loss, codes = self.quantizer(z_e, train=train)
        if code_only:
            return z_q, quant_loss, codes
        return self.decode(z_q), quant_loss, codes

    def encode(self, x: jnp.ndarray):
        return self.quant_conv(self.encoder(x))

    def decode(self, z_q: jnp.ndarray):
        return self.decoder(self.post_quant_conv(z_q))

    def get_codes(self, x: jnp.ndarray):
        _, _, codes = self.quantizer(self.encode(x))
        return codes

    def decode_code(self, codes: jnp.ndarray):
        return self.decode(self.quantizer.embed_code(codes))

    def get_last_layer_path(self):
        return ("decoder", "conv_out", "kernel")
