"""TDRQVAE — per-frame 2D autoencoder with latent-space 3D-Swin temporal
mixing (reference archs/tdrqvae_arch.py:788-977).

An earlier temporal variant superseded by TDCRQVAE3 in the deployed model;
kept for architecture-family parity.  Frames are encoded independently,
latents are mixed across time by `tdswin_pre`, quantized, mixed again by
`tdswin_post`, and decoded per frame.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.config import VQVAEConfig
from pgtformer_tpu.models.rqvae import Encoder2D, Decoder2D
from pgtformer_tpu.models.quantizer import RQBottleneck
from pgtformer_tpu.nn.swin3d import BasicLayer3D
from pgtformer_tpu.registry import ARCH_REGISTRY

Dtype = Any


@ARCH_REGISTRY.register()
class TDRQVAE(nn.Module):
    cfg: VQVAEConfig
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        dd = cfg.ddconfig
        self.encoder = Encoder2D(dd, dtype=self.dtype)
        self.decoder = Decoder2D(dd, dtype=self.dtype)
        self.quantizer = RQBottleneck(
            latent_shape=cfg.latent_shape, code_shape=cfg.code_shape,
            n_embed=cfg.n_embed, decay=cfg.decay,
            shared_codebook=cfg.shared_codebook,
            restart_unused_codes=cfg.restart_unused_codes,
            axis_name=self.axis_name, dtype=self.dtype)
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(dd.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")
        self.tdswin_pre = BasicLayer3D(
            dim=cfg.embed_dim, depth=dd.stages_atten, num_heads=dd.num_head,
            window_size=tuple(dd.window_size), dtype=self.dtype,
            name="tdswin_pre")
        self.tdswin_post = BasicLayer3D(
            dim=cfg.embed_dim, depth=dd.stages_atten, num_heads=dd.num_head,
            window_size=tuple(dd.window_size), dtype=self.dtype,
            name="tdswin_post")

    def __call__(self, x: jnp.ndarray, code_only: bool = False,
                 train: bool = False):
        """x [B, T, H, W, 3] -> (out [B, T, H, W, 3] | z_q, loss, codes)."""
        B, T, H, W, C = x.shape
        z_e = self.encode(x.reshape(B * T, H, W, C))     # [B*T, h, w, D]
        _, fh, fw, fc = z_e.shape
        z_e = self.tdswin_pre(z_e.reshape(B, T, fh, fw, fc))
        z_q, quant_loss, codes = self.quantizer(
            z_e.reshape(B * T, fh, fw, fc), train=train)
        codes = codes.reshape(B, T, *codes.shape[1:])
        z_q = self.tdswin_post(z_q.reshape(B, T, fh, fw, fc))
        if code_only:
            return z_q, quant_loss, codes
        out = self.decode(z_q.reshape(B * T, fh, fw, fc))
        return out.reshape(B, T, H, W, -1), quant_loss, codes

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z_q):
        return self.decoder(self.post_quant_conv(z_q))

    def get_codes(self, x: jnp.ndarray):
        B, T, H, W, C = x.shape
        z_e = self.encode(x.reshape(B * T, H, W, C))
        _, fh, fw, fc = z_e.shape
        z_e = self.tdswin_pre(z_e.reshape(B, T, fh, fw, fc))
        _, _, codes = self.quantizer(z_e.reshape(B * T, fh, fw, fc))
        return codes.reshape(B, T, *codes.shape[1:])
