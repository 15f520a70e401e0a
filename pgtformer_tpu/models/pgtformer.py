"""PGTFormer — parsing-guided temporal-coherent transformer (flagship model).

TPU-native re-design of reference archs/pgtformer_arch.py:435-714:
  * BiSeNet parsing prior -> 1x1 conv -> positional embedding of a 9-layer
    pre-norm transformer over the T*32*32 = 3072 latent tokens;
  * code-index prediction -> codebook lookup -> frozen VQ decoder re-driven
    with temporal Fuse-SFT skip connections weighted by the fidelity knob `w`.

Differences from the reference (deliberate):
  * batch-first [B, N, C] token layout (reference uses torch's seq-first);
    token order is kept t-major to match the reference's reshapes
    (pgtformer_arch.py:614,640);
  * the decoder is *not* inlined (reference pgtformer_arch.py:675-710
    re-implements its decoder loop); we pass a `fuse_fn` hook into
    Decoder3D instead;
  * `w` and the structural flags are trace-time constants (static under jit).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.config import PGTFormerConfig
from pgtformer_tpu.models.vae import Encoder3D, Decoder3D
from pgtformer_tpu.models.quantizer import RQBottleneck
from pgtformer_tpu.models.parser import BiSeNet
from pgtformer_tpu.nn.blocks import group_norm
from pgtformer_tpu.nn.transformer import TransformerSALayer
from pgtformer_tpu.ops.image import (
    imagenet_normalize, adaptive_instance_normalization)
from pgtformer_tpu.registry import ARCH_REGISTRY

Dtype = Any


class _AffineParams(nn.Module):
    """GroupNorm-compatible affine params (scale/bias) without the module."""
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


class _ConvParams(nn.Module):
    """nn.Conv-compatible params (kernel/bias) without the module."""
    features_in: int
    features_out: int
    ksize: int = 3

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.ksize, self.ksize, self.features_in,
                        self.features_out), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features_out,),
                       jnp.float32)
        return k, b


def _conv2d(x, k, strides=(1, 1), padding=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    return jax.lax.conv_general_dilated(x, k, strides, pad,
                                        dimension_numbers=dn)


class _SplitInResnetBlock(nn.Module):
    """ResnetBlock whose input is a *virtual concatenation* of several
    channel groups, evaluated without ever materializing the concat.

    `conv(concat(parts)) == sum_p conv_p(part)` with the kernel sliced along
    its input-channel axis, and the GroupNorm statistics of the concat are
    assembled from per-part per-channel spatial sums — so the parameter tree
    (norm1/conv1/norm2/conv2/nin_shortcut) is identical to ResnetBlock on
    the concatenated input (checkpoint-port parity), but XLA never has to
    build (and lane-pad) the wide [., ., ., sum(C_p)] intermediate.  The
    channel-concat feeding `Fuse_sft_block`'s encode_enc is one of the
    hottest layout costs in the serving step (~3 GB/step of pad traffic at
    res 128 alone).
    """
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        splits = tuple(int(p.shape[-1]) for p in parts)
        in_ch = sum(splits)
        out_ch = self.out_channels
        groups, eps = 32, 1e-6
        cg = in_ch // groups

        s1, b1 = _AffineParams(in_ch, name="norm1")()
        k1, cb1 = _ConvParams(in_ch, out_ch, name="conv1")()
        n, h, w = parts[0].shape[:3]

        # GroupNorm stats of the virtual concat from per-part channel sums
        f32 = jnp.float32
        ch_s1 = jnp.concatenate(
            [jnp.sum(p.astype(f32), axis=(1, 2)) for p in parts], axis=-1)
        ch_s2 = jnp.concatenate(
            [jnp.sum(jnp.square(p.astype(f32)), axis=(1, 2)) for p in parts],
            axis=-1)                                   # [N, in_ch]
        cnt = h * w * cg
        mu = ch_s1.reshape(n, groups, cg).sum(-1) / cnt
        var = ch_s2.reshape(n, groups, cg).sum(-1) / cnt - mu * mu
        inv = jax.lax.rsqrt(var + eps)
        mu_c = jnp.repeat(mu, cg, axis=1)              # [N, in_ch]
        inv_c = jnp.repeat(inv, cg, axis=1)
        a_c = inv_c * s1[None]
        b_c = b1[None] - mu_c * a_c

        hsum = None
        off = 0
        for p, cp in zip(parts, splits):
            sl = slice(off, off + cp)
            hp = (p.astype(f32) * a_c[:, None, None, sl]
                  + b_c[:, None, None, sl])
            hp = jax.nn.silu(hp).astype(self.dtype)
            t = _conv2d(hp, k1[:, :, sl, :].astype(self.dtype))
            hsum = t if hsum is None else hsum + t
            off += cp
        hh = hsum + cb1.astype(self.dtype)

        hh = group_norm(self.dtype, "norm2")(hh)
        hh = jax.nn.silu(hh)
        hh = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                     name="conv2")(hh)

        if in_ch != out_ch:
            ks, bs = _ConvParams(in_ch, out_ch, ksize=1,
                                 name="nin_shortcut")()
            ssum = None
            off = 0
            for p, cp in zip(parts, splits):
                t = _conv2d(p.astype(self.dtype),
                            ks[:, :, off:off + cp, :].astype(self.dtype),
                            padding=0)
                ssum = t if ssum is None else ssum + t
                off += cp
            shortcut = ssum + bs.astype(self.dtype)
        else:
            shortcut = sum(parts) if len(parts) > 1 else parts[0]
        return shortcut + hh


class FuseSftBlock(nn.Module):
    """Controllable feature transformation with cross-frame temporal fusion
    (reference pgtformer_arch.py:435-484 `Fuse_sft_block`).

    I/O: enc_feat, dec_feat [B, T, H, W, C] -> [B, T, H, W, C]
    (-> [B, 1, H, W, C] with `middle_only`).

    `middle_only` (inference): the temporal-fusion path still reads every
    frame (its 1x1 folds are the only frame-mixing ops), but the heavy SFT
    convs (encode_enc resblock + scale/shift 3x3 heads) run on the kept
    middle frame only — exact for the middle frame, skips ~2/3 of the cost.

    Channel-concats are evaluated *virtually* (split-kernel convs; see
    `_SplitInResnetBlock`) — parameters match the reference layout exactly,
    but no wide concatenated tensor is ever materialized.
    """
    in_ch: int
    out_ch: int
    t: int = 3
    tcc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_feat: jnp.ndarray, dec_feat: jnp.ndarray,
                 w: float = 1.0, middle_only: bool = False) -> jnp.ndarray:
        B, T, H, W, C = enc_feat.shape
        enc = enc_feat.reshape(B * T, H, W, C)
        dec = dec_feat.reshape(B * T, H, W, C)

        # temporal-fusion path: per-frame 1x1 to tcc channels, frames folded
        # into channels (t-major), mixed across frames, unfolded.  Two
        # equivalent evaluation plans, parameters identical (the reference's
        # tconvenc/tconvdec 1x1 convs + [1,1,2*T*tcc,T*tcc] tfusion0 kernel):
        #   * "conv": fold tconv* INTO the frame mix — one [C,tcc] x
        #     [tcc,(s,d)] kernel combine per frame at trace time, evaluated
        #     as a single height-T rhs-dilated conv over the (t-major row)
        #     [B, T*H, W, C] view; stays on the NHWC conv path end to end
        #     (the einsum plan lowers to a dot that forces row-major layout
        #     copies of the 128-channel operands at res 256).
        #   * "einsum": 1x1 convs then ONE dot contracting (t, c) -> (s, d).
        from pgtformer_tpu import knobs
        tpath = knobs.get("FUSE_TPATH")

        ttc = T * self.tcc
        ke_k, ke_b = _ConvParams(C, self.tcc, ksize=1, name="tconvenc")()
        kd_k, kd_b = _ConvParams(C, self.tcc, ksize=1, name="tconvdec")()
        kf, bf = _ConvParams(2 * ttc, ttc, ksize=1, name="tfusion0")()
        # [1,1,2ttc,ttc] t-major on both axes -> K[t, c, s, d]
        k_enc = kf[0, 0, :ttc, :].reshape(T, self.tcc, T, self.tcc)
        k_dec = kf[0, 0, ttc:, :].reshape(T, self.tcc, T, self.tcc)
        b_sd = bf.reshape(T, self.tcc)

        t_out = T
        mid = T // 2
        if middle_only:
            # only the middle output frame s=mid is ever consumed
            k_enc = k_enc[:, :, mid:mid + 1]
            k_dec = k_dec[:, :, mid:mid + 1]
            b_sd = b_sd[mid:mid + 1]
            t_out = 1

        if tpath == "conv":
            f32 = jnp.float32
            # combined per-frame kernels [T, C, s, d] and bias [s, d]
            Ke = jnp.einsum("ci,tisd->tcsd", ke_k[0, 0].astype(f32),
                            k_enc.astype(f32))
            Kd = jnp.einsum("ci,tisd->tcsd", kd_k[0, 0].astype(f32),
                            k_dec.astype(f32))
            bc = (jnp.einsum("i,tisd->sd", ke_b.astype(f32),
                             k_enc.astype(f32))
                  + jnp.einsum("i,tisd->sd", kd_b.astype(f32),
                               k_dec.astype(f32))
                  + b_sd.astype(f32))
            sd = t_out * self.tcc

            def tap_conv(x5, K):
                # sum_t x[:, t] @ K[t]: height-T kernel with rhs_dilation=H
                # over the t-major row view [B, T*H, W, C]
                xr = x5.reshape(B, T * H, W, C)
                kr = K.reshape(T, 1, C, sd).astype(self.dtype)
                dn = jax.lax.conv_dimension_numbers(
                    xr.shape, kr.shape, ("NHWC", "HWIO", "NHWC"))
                return jax.lax.conv_general_dilated(
                    xr, kr, window_strides=(1, 1), padding="VALID",
                    rhs_dilation=(H, 1), dimension_numbers=dn)

            fut = (tap_conv(enc_feat, Ke) + tap_conv(dec_feat, Kd)
                   + bc.reshape(sd).astype(self.dtype))    # [B, H, W, s*d]
            if t_out > 1:
                fut = fut.reshape(B, H, W, t_out, self.tcc)
                fut = fut.transpose(0, 3, 1, 2, 4)
            fut = fut.reshape(B * t_out, H, W, self.tcc)
        else:
            enct = _conv2d(enc.astype(self.dtype),
                           ke_k.astype(self.dtype), padding=0) \
                + ke_b.astype(self.dtype)
            dect = _conv2d(dec.astype(self.dtype),
                           kd_k.astype(self.dtype), padding=0) \
                + kd_b.astype(self.dtype)
            e5 = enct.reshape(B, T, H, W, self.tcc)
            d5 = dect.reshape(B, T, H, W, self.tcc)
            fut = (jnp.einsum("bthwc,tcsd->bshwd", e5,
                              k_enc.astype(self.dtype))
                   + jnp.einsum("bthwc,tcsd->bshwd", d5,
                                k_dec.astype(self.dtype))
                   + b_sd.astype(self.dtype)[None, :, None, None, :])
            fut = fut.reshape(B * t_out, H, W, self.tcc)

        if middle_only:
            # all remaining ops are per-frame: keep the middle frame only
            enc = enc_feat[:, mid:mid + 1].reshape(B, H, W, C)
            dec = dec_feat[:, mid:mid + 1].reshape(B, H, W, C)
        fut = nn.Conv(self.tcc, (1, 1), dtype=self.dtype, name="tfusion1")(fut)

        feat = _SplitInResnetBlock(out_channels=self.out_ch,
                                   dtype=self.dtype,
                                   name="encode_enc")([enc, dec, fut])

        def sft_head(name):
            h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_0")(feat)
            h = nn.leaky_relu(h, negative_slope=0.2)
            # last conv ZERO-initialized: the block starts as the identity
            # (out == dec_feat), so a w>0 forward with untrained fuse
            # blocks equals the w=0 forward instead of an out-of-scale
            # perturbation (measured [-34, +50] on [0,1] targets with
            # fan-in init -> stage-III collapse-to-black within ~500
            # iters, exp/r4_stage3_randD).  The reference author left the
            # same fix commented out (`# last_zero_init(self.scale)`,
            # pgtformer_arch.py:451-452); init distributions are not
            # checkpoint-affecting, ported weights overwrite this.
            return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           name=f"{name}_2")(h)

        scale = sft_head("scale")
        shift = sft_head("shift")
        out = dec + w * (dec * scale + shift)
        return out.reshape(B, t_out, H, W, self.out_ch)


@ARCH_REGISTRY.register()
class PGTFormer(nn.Module):
    """Flagship blind video face restoration model
    (reference archs/pgtformer_arch.py:490-714).

    __call__(x [B, T, H, W, 3] in [0,1], w, ...) ->
        (out [B*T, H, W, 3], logits [B*T, h, w, d, n_embed],
         lq_feat [B*T, h, w, embed_dim])
    """
    cfg: PGTFormerConfig
    axis_name: Optional[str] = None
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        vq = cfg.vqvae
        self.encoder = Encoder3D(vq.ddconfig, checkpointing=vq.checkpointing,
                                 use_pallas=self.use_pallas,
                                 dtype=self.dtype)
        self.decoder = Decoder3D(vq.ddconfig, num_frames=vq.tf,
                                 checkpointing=vq.checkpointing,
                                 use_pallas=self.use_pallas,
                                 dtype=self.dtype)
        self.quantizer = RQBottleneck(
            latent_shape=vq.latent_shape, code_shape=vq.code_shape,
            n_embed=vq.n_embed, decay=vq.decay,
            shared_codebook=vq.shared_codebook,
            restart_unused_codes=vq.restart_unused_codes,
            axis_name=self.axis_name, dtype=self.dtype)
        self.quant_conv = nn.Conv(vq.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(vq.ddconfig.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

        dd = vq.ddconfig
        latent_res = dd.resolution // 2 ** (dd.num_resolutions - 1)
        self.conditionnet = BiSeNet(cfg.n_parsing_classes,
                                    out_hw=(latent_res, latent_res),
                                    dtype=self.dtype)
        # 57 -> dim_embd positional projection (512 in the deployed config;
        # reference pgtformer_arch.py:520 hardcodes 512)
        self.convpos = nn.Conv(cfg.dim_embd, (1, 1), dtype=self.dtype,
                               name="convpos")
        self.feat_emb = nn.Dense(cfg.dim_embd, dtype=self.dtype,
                                 name="feat_emb")
        self.ft_layers = [TransformerSALayer(
            embed_dim=cfg.dim_embd, nhead=cfg.n_head,
            dim_mlp=cfg.dim_embd * 2, use_pallas=self.use_pallas,
            dtype=self.dtype,
            name=f"ft_layers_{i}") for i in range(cfg.n_layers)]

        self.codebook_size = (vq.n_embed if isinstance(vq.n_embed, int)
                              else vq.n_embed[-1])
        self.quantizer_depth = vq.code_shape[-1]
        self.idx_pred_norm = nn.LayerNorm(dtype=self.dtype,
                                          name="idx_pred_norm")
        self.idx_pred_head = nn.Dense(
            self.quantizer_depth * self.codebook_size, use_bias=False,
            dtype=self.dtype, name="idx_pred_head")

        # encoder feature channels / multi_res_feats index per resolution,
        # derived from ddconfig (equals the reference's hardcoded tables
        # :535-544 at the deployed geometry)
        channels = {}
        fuse_encoder_indices = {}
        for i in range(dd.num_resolutions):
            res = dd.resolution // 2 ** i
            channels[str(res)] = dd.ch * dd.ch_mult[i]
            fuse_encoder_indices[str(res)] = i
        self.channels = channels
        self.fuse_encoder_indices = fuse_encoder_indices
        self.fuse_convs_dict = {
            f_size: FuseSftBlock(self.channels[f_size], self.channels[f_size],
                                 t=vq.tf, dtype=self.dtype,
                                 name=f"fuse_convs_{f_size}")
            for f_size in cfg.connect_list}

    def __call__(self, x: jnp.ndarray, w: Optional[float] = None,
                 detach_16: bool = True, code_only: bool = False,
                 adain: Optional[bool] = None, train: bool = False,
                 middle_only: bool = False):
        B, T, H, W, _ = x.shape
        pos, trunk_h, trunk_feats = self.encode_frames(
            x.reshape(B * T, H, W, 3))
        to_win = lambda a: a.reshape(B, T, *a.shape[1:])
        return self.restore_windows(
            to_win(pos), to_win(trunk_h),
            tuple(to_win(f) for f in trunk_feats),
            w=w, detach_16=detach_16, code_only=code_only, adain=adain,
            middle_only=middle_only)

    def encode_frames(self, frames: jnp.ndarray):
        """Per-frame (cacheable) compute: frames [F, H, W, 3] in [0,1] ->
        (query-pos embedding [F, th, tw, C], encoder-trunk features
        [F, h', w', C'], per-frame trunk skip features tuple).

        Everything here is strictly per-frame — the BiSeNet prior and the
        encoder levels before the first attention resolution (reference
        tdcrqvae3_arch.py:493-501) — so at inference each unique video frame
        pays this once, not once per overlapping window (kills the 3x
        sliding-window recompute of reference inference.py:37-74)."""
        F, H, W, _ = frames.shape
        nx = imagenet_normalize(frames)
        cond = self.conditionnet(nx)                     # [F, 32, 32, 57]
        pos = self.convpos(cond)                         # [F, 32, 32, 512]
        trunk_h, trunk_feats = self.encoder(frames[None], stage="trunk")
        squeeze = lambda a: a.reshape(a.shape[1], *a.shape[2:])
        return (pos, squeeze(trunk_h),
                tuple(squeeze(f) for f in trunk_feats))

    def restore_windows(self, pos: jnp.ndarray, trunk_h: jnp.ndarray,
                        trunk_feats, w: Optional[float] = None,
                        detach_16: bool = True, code_only: bool = False,
                        adain: Optional[bool] = None,
                        middle_only: bool = False):
        """Temporal (per-window) compute over gathered per-frame features
        (each [B, T, ...] — outputs of `encode_frames` stacked into sliding
        windows): encoder attention levels, parsing-guided transformer,
        code prediction, fuse-SFT decode.

        Returns (out, logits, lq_feat); `out` is [B*T, H, W, 3], or the kept
        middle frames [B, H, W, 3] with `middle_only` (see Decoder3D)."""
        cfg = self.cfg
        if w is None:
            w = cfg.w
        if adain is None:
            adain = cfg.adain
        B, T = pos.shape[:2]
        th, tw = pos.shape[2:4]
        query_pos = pos.reshape(B, T * th * tw, pos.shape[-1])

        # ---- encoder attention levels + multi-resolution feature taps ------
        z, head_feats = self.encoder(trunk_h, return_multi_res_feats=True,
                                     stage="head")
        multi_res_feats = list(trunk_feats) + list(head_feats)
        enc_feat_dict: Dict[str, jnp.ndarray] = {}
        for f_size in cfg.connect_list:
            idx = self.fuse_encoder_indices[f_size]
            enc_feat_dict[f_size] = multi_res_feats[idx]
        lq_feat = self.quant_conv(z)                     # [B*T, th, tw, 512]

        # ---- parsing-guided transformer -------------------------------------
        tokens = self.feat_emb(lq_feat)                  # [B*T, th, tw, C]
        cc = tokens.shape[-1]
        tokens = tokens.reshape(B, T * th * tw, cc)
        for layer in self.ft_layers:
            tokens = layer(tokens, query_pos=query_pos)

        logits = self.idx_pred_head(self.idx_pred_norm(tokens))
        logits = logits.reshape(B * T, th, tw, self.quantizer_depth,
                                self.codebook_size)

        if code_only:  # training stage II
            return logits, lq_feat

        # ---- quantization ----------------------------------------------------
        codes = jnp.argmax(logits, axis=-1)              # [B*T, th, tw, d]
        out = self._decode_restored(codes, lq_feat, enc_feat_dict, w=w,
                                    detach_16=detach_16, adain=adain,
                                    middle_only=middle_only)
        return out, logits, lq_feat

    def _decode_restored(self, codes, lq_feat, enc_feat_dict, *, w,
                         detach_16, adain, middle_only: bool = False):
        """Codebook lookup -> (detach/AdaIN) -> fuse-SFT decode."""
        quant_feat = self.quantizer.embed_code(codes)    # [B*T, th, tw, 512]
        if detach_16:
            quant_feat = jax.lax.stop_gradient(quant_feat)
        if adain:
            quant_feat = adaptive_instance_normalization(quant_feat, lq_feat)

        fuse_fn = None
        fuse_resolutions = ()
        if w > 0:
            fuse_resolutions = tuple(int(k) for k in self.fuse_convs_dict)

            def fuse_fn(resolution: int, h: jnp.ndarray,
                        middle_only: bool = False) -> jnp.ndarray:
                key = str(resolution)
                if key in self.fuse_convs_dict:
                    enc = jax.lax.stop_gradient(enc_feat_dict[key])
                    h = self.fuse_convs_dict[key](enc, h, w=w,
                                                  middle_only=middle_only)
                return h

        z_dec = self.post_quant_conv(quant_feat)
        return self.decoder(z_dec, fuse_fn=fuse_fn, middle_only=middle_only,
                            fuse_resolutions=fuse_resolutions)

    def restore_from_codes(self, x: jnp.ndarray, codes: jnp.ndarray,
                           w: Optional[float] = None,
                           adain: Optional[bool] = None) -> jnp.ndarray:
        """Restore with externally supplied code indices (code-space
        editing / diagnostics): runs the encoder for the LQ features and
        fuse skips, then decodes `codes` through the standard path."""
        cfg = self.cfg
        if w is None:
            w = cfg.w
        if adain is None:
            adain = cfg.adain
        z, multi_res_feats = self.encoder(x, return_multi_res_feats=True)
        enc_feat_dict = {f: multi_res_feats[self.fuse_encoder_indices[f]]
                         for f in cfg.connect_list}
        lq_feat = self.quant_conv(z)
        return self._decode_restored(codes, lq_feat, enc_feat_dict, w=w,
                                     detach_16=True, adain=adain)

    # -- auxiliary API (parity with reference TDCRQVAE3 methods) -------------
    def encode(self, x: jnp.ndarray):
        return self.quant_conv(self.encoder(x))

    def get_codes(self, x: jnp.ndarray) -> jnp.ndarray:
        z_e = self.encode(x)
        _, _, codes = self.quantizer(z_e)
        return codes

    def decode_code(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(self.quantizer.embed_code(codes)))
