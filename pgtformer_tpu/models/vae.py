"""TDCRQVAE3 — temporal-deformation-capable RQ-VAE (flagship autoencoder).

TPU-native re-design of reference archs/tdcrqvae3_arch.py:460-873:
  * channels-last [B, T, H, W, C] video tensors, NHWC convs;
  * spatio-temporal shifted-window attention towers (EncoderLayer) at the
    configured attention resolutions;
  * RQBottleneck with EMA codebooks (see quantizer.py);
  * `jax.checkpoint` rematerialisation instead of torch checkpointing.

Deployed config (options/release_test_stage_IIII_dont_need_align_version.yml:70-87):
512x512 input, ch 64, ch_mult [1,2,4,4,8], 1 res-block/level, attention at
{32,64,128} with 4x4 windows over T=3 frames, z_channels 256, codebook 1024x512.
"""

from __future__ import annotations

import os
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.config import DDConfig, VQVAEConfig
from pgtformer_tpu.nn.blocks import (
    ResnetBlock, Upsample, Downsample, EncoderLayer, group_norm)
from pgtformer_tpu.models.quantizer import RQBottleneck
from pgtformer_tpu.registry import ARCH_REGISTRY

Dtype = Any


class Encoder3D(nn.Module):
    """Conv tower with spatio-temporal window attention
    (reference tdcrqvae3_arch.py:460-573).

    I/O: [B, T, H, W, C_in] -> [B*T, H/2^L, W/2^L, z_channels]
    (+ per-level features when `return_multi_res_feats`).

    `stage` splits the tower at the first attention level for inference-time
    caching (the leading levels are strictly per-frame convs, so their
    features can be computed once per unique video frame and reused across
    the sliding-window overlap — SURVEY.md §3.1):
      * "trunk": conv_in + attention-free leading levels;
        returns (h, trunk_feats).
      * "head":  input is the trunk's `h`; runs the remaining levels,
        middle and output convs.
      * "full":  trunk + head (default; same math as round 1).
    """
    cfg: DDConfig
    checkpointing: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_multi_res_feats: bool = False,
                 stage: str = "full"):
        cfg = self.cfg
        assert stage in ("full", "trunk", "head")
        num_res = cfg.num_resolutions
        split = cfg.first_attn_level

        def maybe_remat(mod):
            return nn.remat(mod) if self.checkpointing else mod

        def run_levels(h, levels, T):
            feats: List[jnp.ndarray] = []
            for i_level in levels:
                curr_res = cfg.level_resolutions()[i_level]
                block_out = cfg.ch * cfg.ch_mult[i_level]
                has_attn = curr_res in cfg.attn_resolutions
                for i_block in range(cfg.num_res_blocks):
                    h = maybe_remat(ResnetBlock)(
                        out_channels=block_out, dropout=cfg.dropout,
                        dtype=self.dtype,
                        name=f"down_{i_level}_block_{i_block}")(h)
                    if has_attn:
                        h = EncoderLayer(
                            dim=block_out, depth=cfg.depths[i_level],
                            num_heads=cfg.num_heads[i_level], num_frames=T,
                            window_size=tuple(cfg.window_sizes[i_level]),
                            mlp_ratio=1.0, use_pallas=self.use_pallas,
                            dtype=self.dtype,
                            name=f"down_{i_level}_attn_{i_block}")(h)
                feats.append(h)
                if i_level != num_res - 1:
                    h = Downsample(with_conv=cfg.resamp_with_conv,
                                   dtype=self.dtype,
                                   name=f"down_{i_level}_downsample")(h)
            return h, feats

        multi_res_feats: List[jnp.ndarray] = []
        if stage in ("full", "trunk"):
            B, T, H, W, Cin = x.shape
            h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_in")(x.reshape(B * T, H, W, Cin))
            h = h.reshape(B, T, H, W, cfg.ch)
            h, trunk_feats = run_levels(h, range(split), T)
            multi_res_feats.extend(trunk_feats)
            if stage == "trunk":
                return h, multi_res_feats
        else:
            h = x
            T = h.shape[1]

        h, head_feats = run_levels(h, range(split, num_res), T)
        multi_res_feats.extend(head_feats)

        # middle
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = maybe_remat(ResnetBlock)(dropout=cfg.dropout, dtype=self.dtype,
                                     name="mid_block_1")(h)
        h = EncoderLayer(dim=block_in, depth=cfg.depths[-1],
                         num_heads=cfg.num_heads[-1], num_frames=T,
                         window_size=tuple(cfg.window_sizes[-1]),
                         mlp_ratio=1.0, use_pallas=self.use_pallas, dtype=self.dtype,
                         name="mid_attn_1")(h)
        h = maybe_remat(ResnetBlock)(dropout=cfg.dropout, dtype=self.dtype,
                                     name="mid_block_2")(h)

        # end (per-frame)
        Bc, Tc, Hc, Wc, Cc = h.shape
        h = h.reshape(Bc * Tc, Hc, Wc, Cc)
        h = group_norm(self.dtype, "norm_out")(h)
        h = jax.nn.silu(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(out_c, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        if return_multi_res_feats:
            return h, multi_res_feats
        return h


class Decoder3D(nn.Module):
    """Mirror decoder tower (reference tdcrqvae3_arch.py:577-707).

    I/O: z [B*T, h, w, z_channels] -> [B*T, H, W, out_ch].

    `fuse_fn(resolution, h, middle_only=False)` — optional hook called after
    each level's blocks/attention, *before* its upsample; this is how
    PGTFormer injects its controllable-feature-transformation skips without
    re-implementing the decoder loop (reference pgtformer_arch.py:675-710
    inlines the whole decoder instead).

    `middle_only` (inference): produce only the kept middle frame.  Every
    stage past the last cross-frame op — the last attention level
    (attn_resolutions, {32,64,128} deployed) or the last fuse block's
    temporal-fusion path (`fuse_resolutions`) — is strictly per-frame, so
    the non-middle frames are sliced off there and the most expensive
    high-resolution levels run on 1 frame instead of T (the reference pays
    the full T-frame decode and discards T-1 frames — inference.py:15).
    `fuse_resolutions` must list the resolutions at which `fuse_fn` mixes
    frames (ignored without `middle_only`).
    """
    cfg: DDConfig
    num_frames: int = 3
    give_pre_end: bool = False
    checkpointing: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray,
                 fuse_fn: Optional[Callable] = None,
                 middle_only: bool = False,
                 fuse_resolutions: Tuple[int, ...] = ()):
        cfg = self.cfg
        T = self.num_frames
        num_res = cfg.num_resolutions
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (num_res - 1)

        BT, hh, ww, zc = z.shape
        B = BT // T

        # static slice-point analysis: the last executed level whose stages
        # need all T frames (attention, or a frame-mixing fuse block)
        fuse_set = set(fuse_resolutions) if fuse_fn is not None else set()
        exec_order = list(reversed(range(num_res)))
        res_at = {}
        r = curr_res
        for i in exec_order:
            res_at[i] = r
            if i != 0:
                r *= 2
        last_na_level = None  # last level (execution order) needing all frames
        for i in exec_order:
            if res_at[i] in cfg.attn_resolutions or res_at[i] in fuse_set:
                last_na_level = i

        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)

        def maybe_remat(mod):
            return nn.remat(mod) if self.checkpointing else mod

        # middle
        h = maybe_remat(ResnetBlock)(dropout=cfg.dropout, dtype=self.dtype,
                                     name="mid_block_1")(h)
        h = h.reshape(B, T, hh, ww, block_in)
        h = EncoderLayer(dim=block_in, depth=cfg.depths[-1],
                         num_heads=cfg.num_heads[-1], num_frames=T,
                         window_size=tuple(cfg.window_sizes[-1]),
                         mlp_ratio=1.0, use_pallas=self.use_pallas, dtype=self.dtype,
                         name="mid_attn_1")(h)
        h = maybe_remat(ResnetBlock)(dropout=cfg.dropout, dtype=self.dtype,
                                     name="mid_block_2")(h)

        t_cur = T
        if middle_only and last_na_level is None:
            h = h[:, T // 2:T // 2 + 1]
            t_cur = 1

        # upsampling
        for i_level in exec_order:
            block_out = cfg.ch * cfg.ch_mult[i_level]
            has_attn = curr_res in cfg.attn_resolutions
            for i_block in range(cfg.num_res_blocks + 1):
                h = maybe_remat(ResnetBlock)(
                    out_channels=block_out, dropout=cfg.dropout,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}")(h)
                if has_attn:
                    h = EncoderLayer(
                        dim=block_out, depth=cfg.depths[i_level],
                        num_heads=cfg.num_heads[i_level], num_frames=t_cur,
                        window_size=tuple(cfg.window_sizes[i_level]),
                        mlp_ratio=1.0, use_pallas=self.use_pallas, dtype=self.dtype,
                        name=f"up_{i_level}_attn_{i_block}")(h)
            at_slice_level = middle_only and i_level == last_na_level
            if fuse_fn is not None:
                fuse_mid = at_slice_level and curr_res in fuse_set
                h = fuse_fn(curr_res, h, middle_only=fuse_mid)
                if fuse_mid:
                    t_cur = 1
            if at_slice_level and t_cur == T:
                # last cross-frame stage was the attention above (no fuse
                # here): everything past this point is per-frame
                h = h[:, T // 2:T // 2 + 1]
                t_cur = 1
            if i_level != 0:
                # Opt-in (PGT_FUSED_TAIL=1 full chain / "up" upsample-only):
                # in the production pipeline graph XLA's in-context conv
                # lowering beats these kernels (29.85 vs 28.7/28.5 fps
                # measured A/B on chip), so the default is off; standalone
                # restore graphs DO win ~37 ms/6 windows with "1" — see
                # BASELINE.md round-2 notes.
                from pgtformer_tpu import knobs
                tail_mode = knobs.get("FUSED_TAIL")
                # bf16-only: the kernels compute in bf16 internally, so
                # enabling them under fp32 serving would silently demote
                # decoder-tail precision
                pallas_ok = (self.use_pallas and not self.is_initializing()
                             and self.dtype == jnp.bfloat16
                             and cfg.resamp_with_conv
                             and h.shape[2] % 8 == 0
                             and h.shape[-1] % 128 == 0)
                fused_tail_ok = (
                    tail_mode == "1" and pallas_ok
                    and i_level == 1 and t_cur == 1
                    and cfg.num_res_blocks == 1
                    and not self.give_pre_end
                    and h.shape[2] % 16 == 0
                    and (2 * curr_res) not in cfg.attn_resolutions
                    and (2 * curr_res) not in fuse_set)
                if tail_mode == "up" and pallas_ok:
                    # subpixel upsample as a Pallas kernel with direct
                    # interleaved write (the XLA lowering of the phase
                    # interleave is a chain of pad/concat passes)
                    from pgtformer_tpu.ops.pallas_conv import (
                        subpixel_up_conv3x3)
                    p_up = self.variables["params"][
                        f"up_{i_level}_upsample"]["conv"]
                    B5, T5, H5, W5, C5 = h.shape
                    y, _ = subpixel_up_conv3x3(
                        h.reshape(B5 * T5, H5, W5, C5),
                        p_up["kernel"], p_up["bias"], emit_stats=False)
                    h = y.reshape(B5, T5, 2 * H5, 2 * W5, C5).astype(h.dtype)
                    curr_res *= 2
                    continue
                if fused_tail_ok:
                    # upsample + both level-0 resblocks + norm_out/silu as
                    # one fused Pallas chain (see ops/pallas_conv.py) —
                    # kills the separate GN-stats/SiLU/interleave HBM
                    # passes of the highest-resolution per-frame tail
                    from pgtformer_tpu.ops.pallas_conv import (
                        fused_decoder_tail)
                    params = self.variables["params"]
                    B5, T5 = h.shape[:2]
                    y = fused_decoder_tail(
                        h.reshape(B5 * T5, *h.shape[2:]),
                        params["up_1_upsample"], params["up_0_block_0"],
                        params["up_0_block_1"], params["norm_out"])
                    return nn.Conv(cfg.out_ch, (3, 3), padding=1,
                                   dtype=self.dtype, name="conv_out")(y)
                h = Upsample(with_conv=cfg.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.give_pre_end:
            return h

        Bc, Tc, Hc, Wc, Cc = h.shape
        h = h.reshape(Bc * Tc, Hc, Wc, Cc)
        h = group_norm(self.dtype, "norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


@ARCH_REGISTRY.register()
class TDCRQVAE3(nn.Module):
    """Temporal RQ-VAE (reference archs/tdcrqvae3_arch.py:711-873).

    __call__(x [B, T, H, W, 3], code_only, train) ->
        (out [B*T, H, W, 3] | z_q, quant_loss, codes)
    """
    cfg: VQVAEConfig
    axis_name: Optional[str] = None
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        assert cfg.loss_type in ("mse", "l1")
        if cfg.bottleneck_type != "rq":
            raise ValueError("invalid 'bottleneck_type' (must be 'rq')")
        self.encoder = Encoder3D(cfg.ddconfig, checkpointing=cfg.checkpointing,
                                 use_pallas=self.use_pallas, dtype=self.dtype)
        self.decoder = Decoder3D(cfg.ddconfig, num_frames=cfg.tf,
                                 checkpointing=cfg.checkpointing,
                                 use_pallas=self.use_pallas,
                                 dtype=self.dtype)
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
        z_e = self.encode(x)
        z_q, quant_loss, codes = self.quantizer(z_e, train=train)
        if code_only:
            return z_q, quant_loss, codes
        out = self.decode(z_q)
        return out, quant_loss, codes

    def encode(self, x: jnp.ndarray,
               return_multi_res_feats: bool = False):
        """x [B, T, H, W, 3] -> z_e [B*T, h, w, embed_dim]."""
        if return_multi_res_feats:
            h, feats = self.encoder(x, return_multi_res_feats=True)
            return self.quant_conv(h), feats
        h = self.encoder(x)
        return self.quant_conv(h)

    def decode(self, z_q: jnp.ndarray) -> jnp.ndarray:
        """z_q [B*T, h, w, embed_dim] -> [B*T, H, W, out_ch]."""
        return self.decoder(self.post_quant_conv(z_q))

    def get_codes(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, T, H, W, 3] -> codes.

        Accepts the windowed clip layout directly — the analog of reference
        `get_codesbt` (tdcrqvae3_arch.py:795-800); the reference's
        `get_codes` (:786-792) instead takes the flattened [B*T, C, H, W]
        batch and re-folds by `self.t` — see `get_codes_flat`."""
        z_e = self.encode(x)
        _, _, codes = self.quantizer(z_e)
        return codes

    def get_codesbt(self, xs: jnp.ndarray) -> jnp.ndarray:
        """Reference-named alias (tdcrqvae3_arch.py:795-800): codes for an
        explicit [B, T, H, W, 3] clip.  (The reference's own get_codesbt
        flattens to 4D before calling its 5D encoder and crashes as
        shipped; this implements the evident intent, which matches its
        working `get_codes` on the flattened batch.)"""
        return self.get_codes(xs)

    def get_codes_flat(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        """Codes for a flattened [B*T, H, W, 3] frame batch, re-folded by
        the configured window length (reference `get_codes`,
        tdcrqvae3_arch.py:786-792)."""
        BT, H, W, C = x_flat.shape
        T = self.cfg.tf
        return self.get_codes(x_flat.reshape(BT // T, T, H, W, C))

    def get_soft_codes(self, x: jnp.ndarray, temp: float = 1.0,
                       stochastic: bool = False):
        z_e = self.encode(x)
        return self.quantizer.get_soft_codes(z_e, temp=temp,
                                             stochastic=stochastic)

    def decode_code(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.quantizer.embed_code(codes))

    def decode_partial_code(self, codes: jnp.ndarray, code_idx: int,
                            decode_type: str = "select") -> jnp.ndarray:
        z_q = self.quantizer.embed_partial_code(codes, code_idx, decode_type)
        return self.decode(z_q)

    def forward_partial_code(self, x: jnp.ndarray, code_idx: int,
                             decode_type: str = "select") -> jnp.ndarray:
        """Reconstruct using the first codebooks only
        (reference tdcrqvae3_arch.py:865-872)."""
        codes = self.get_codes(x)
        return self.decode_partial_code(codes, code_idx, decode_type)

    def get_code_emb_with_depth(self, codes: jnp.ndarray):
        """Per-depth code embeddings (reference :850-852)."""
        return self.quantizer.embed_code_with_depth(codes)

    @staticmethod
    def get_recon_imgs(xs_real: jnp.ndarray, xs_recon: jnp.ndarray):
        """[-1,1] -> [0,1] display mapping (reference :815-821)."""
        xs_real = xs_real * 0.5 + 0.5
        xs_recon = jnp.clip(xs_recon * 0.5 + 0.5, 0.0, 1.0)
        return xs_real, xs_recon

    def compute_loss(self, out, quant_loss, codes, xs, valid: bool = False):
        """Reconstruction + weighted commitment loss
        (reference tdcrqvae3_arch.py:823-845)."""
        diff = out.astype(jnp.float32) - xs.astype(jnp.float32)
        if self.cfg.loss_type == "mse":
            loss_recon = jnp.mean(diff ** 2)
        else:
            loss_recon = jnp.mean(jnp.abs(diff))
        loss_latent = quant_loss
        if valid:
            loss_recon = loss_recon * xs.shape[0] * xs.shape[1]
            loss_latent = loss_latent * xs.shape[0]
        total = loss_recon + self.cfg.latent_loss_weight * loss_latent
        return {"loss_total": total, "loss_recon": loss_recon,
                "loss_latent": loss_latent, "codes": [codes]}
