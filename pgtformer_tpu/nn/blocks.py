"""Reusable NN building blocks (flax.linen, channels-last, static shapes).

TPU-native re-implementations of the reference block zoo
(reference modules/rstt_layers.py):

  * :class:`ResnetBlock`       — GroupNorm/SiLU/3x3-conv resblock
                                 (ref TDResnetBlock :835-911, ResnetBlock :763-830,
                                 pgtformer_arch.ResBlock :409-432 — same math).
  * :class:`Upsample`          — nearest-2x + conv (ref tdcrqvae3_arch.py:34-52).
  * :class:`Downsample`        — asymmetric-pad stride-2 conv (ref :55-76).
  * :class:`WindowAttention3D` — joint spatio-temporal W-MSA/W-MCA with 3D
                                 relative position bias (ref rstt_layers.py:134-234).
  * :class:`SWTransformerBlock`— LN -> (shift) -> W-MSA -> LN -> MLP
                                 (ref VSTSREncoderTransformerBlock :236-338 and
                                 VSTSRDecoderTransformerBlock :340-497).
  * :class:`EncoderLayer` / :class:`DecoderLayer`
                               — alternating-shift stacks (ref :499-662).

Design deltas vs. the reference (deliberate, TPU-first):
  * channels-last `[B, T, H, W, C]` I/O everywhere — no 5D<->4D `.view`
    gymnastics; convs run in NHWC which is XLA:TPU's native conv layout.
  * SW-MSA masks and relative-position indices are NumPy constants computed
    at trace time (see pgtformer_tpu/ops/window.py), never device code.
  * everything is shape-static; `jax.checkpoint` (remat) replaces
    torch.utils.checkpoint.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.ops.window import (
    window_partition,
    window_reverse,
    relative_position_index,
    shifted_window_mask,
    effective_window_shift,
)

Dtype = Any


def group_norm(dtype: Dtype = jnp.float32, name: str | None = None) -> nn.GroupNorm:
    """GroupNorm(32, eps=1e-6, affine) — reference rstt_layers.py:754-755."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> conv3x3, twice, with 1x1 shortcut on channel change.

    Accepts [B, T, H, W, C] or [N, H, W, C]; time is folded into batch for the
    per-frame convs (semantics of reference TDResnetBlock rstt_layers.py:875-904).
    """
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        orig_shape = x.shape
        if x.ndim == 5:
            B, T, H, W, C = x.shape
            x = x.reshape(B * T, H, W, C)
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        h = group_norm(self.dtype, "norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = group_norm(self.dtype, "norm2")(h)
        h = jax.nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        out = x + h
        if len(orig_shape) == 5:
            out = out.reshape(*orig_shape[:-1], out_ch)
        return out


class _Conv3x3Params(nn.Module):
    """Parameter container with nn.Conv's exact names/shapes/inits, so the
    torch-checkpoint port path is identical whether or not the subpixel
    rewrite is active."""
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _subpixel_up_conv(x: jnp.ndarray, k3: jnp.ndarray, bias: jnp.ndarray,
                      dtype) -> jnp.ndarray:
    """conv3x3(nearest_up2(x)) as four 2x2 convs on the source grid.

    Under nearest-2x, output pixel (2i+a, 2j+b) taps source rows
    {i-1: k[0], i: k[1]+k[2]} for a=0 and {i: k[0]+k[1], i+1: k[2]} for
    a=1 (same along columns) — so the 3x3 kernel pre-sums into one 2x2
    kernel per parity class.  Exact up to fp32 summation order.
    """
    N, H, W, C = x.shape

    def pair(k, a, axis):
        s0, s1, s2 = (jnp.take(k, i, axis=axis) for i in range(3))
        if a == 0:
            return jnp.stack([s0, s1 + s2], axis=axis)
        return jnp.stack([s0 + s1, s2], axis=axis)

    k3 = k3.astype(jnp.float32)
    xc = x.astype(dtype)
    dn = jax.lax.conv_dimension_numbers(xc.shape, (2, 2, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
    outs = []
    for a in (0, 1):
        ka = pair(k3, a, 0)
        for b in (0, 1):
            kab = pair(ka, b, 1).astype(dtype)
            pad = [((1, 0) if a == 0 else (0, 1)),
                   ((1, 0) if b == 0 else (0, 1))]
            o = jax.lax.conv_general_dilated(
                xc, kab, window_strides=(1, 1), padding=pad,
                dimension_numbers=dn)
            outs.append(o + bias.astype(dtype))
    stacked = jnp.stack(outs).reshape(2, 2, N, H, W, C)
    return stacked.transpose(2, 3, 0, 4, 1, 5).reshape(N, 2 * H, 2 * W, C)


# phase-combination matrix: output tap u reads dilated source offsets via
# rows {u=0: r0, u=1: r0+r1, u=2: r1+r2, u=3: r2} (see _subpixel_up_conv)
_PHASE_A = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], np.float32)


def _subpixel_up_conv_dilated(x: jnp.ndarray, k3: jnp.ndarray,
                              bias: jnp.ndarray, dtype) -> jnp.ndarray:
    """conv3x3(nearest_up2(x)) as ONE lhs-dilated (transposed) conv.

    Equivalent to `_subpixel_up_conv` but emits a single stride-1
    lhs_dilation=2 conv with a derived 4x4 kernel — no phase-stack /
    interleave chain in HBM (the stack+transpose pair costs ~2.5 ms per
    upsample at res-256 in the serving step trace).  K44 = A k3 A^T over
    the spatial taps: K44[u,v] = sum_{r,c} A[u,r] A[v,c] k3[r,c].
    """
    N, H, W, C = x.shape
    A = jnp.asarray(_PHASE_A)
    k44 = jnp.einsum("ur,vc,rcio->uvio", A, A,
                     k3.astype(jnp.float32)).astype(dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, (4, 4, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k44, window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=dn)
    return y + bias.astype(dtype)


class Upsample(nn.Module):
    """Nearest-2x upsample + optional conv3x3 (reference tdcrqvae3_arch.py:34-52).

    `subpixel` computes the mathematically identical result as four 2x2
    convs on the PRE-upsample grid: under nearest-2x, the 3x3 taps of each
    output-parity class hit at most 2x2 unique source pixels, so the 3x3
    weights pre-sum into four 2x2 kernels — 16 vs 36 MACs per output pixel
    (2.25x fewer FLOPs) and no 4x-size intermediate in HBM.  Parameters
    stay the stock 3x3 conv kernel (checkpoint-port parity); the 2x2
    kernels are derived at trace time.
    """
    with_conv: bool = True
    subpixel: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        if x.ndim == 5:
            B, T, H, W, C = shape
            x = x.reshape(B * T, H, W, C)
        if self.with_conv and self.subpixel:
            k3, b = _Conv3x3Params(x.shape[-1], name="conv")()
            from pgtformer_tpu import knobs
            if knobs.get("SUBPIXEL") == "dilated":
                x = _subpixel_up_conv_dilated(x, k3, b, self.dtype)
            else:
                x = _subpixel_up_conv(x, k3, b, self.dtype)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            if self.with_conv:
                x = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                            name="conv")(x)
        if len(shape) == 5:
            x = x.reshape(shape[0], shape[1], shape[2] * 2, shape[3] * 2, -1)
        return x


class Downsample(nn.Module):
    """Stride-2 conv3x3 with (0,1)x(0,1) asymmetric pad, or 2x2 avg-pool
    (reference tdcrqvae3_arch.py:55-76)."""
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        if x.ndim == 5:
            B, T, H, W, C = shape
            x = x.reshape(B * T, H, W, C)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                        padding=((0, 1), (0, 1)), dtype=self.dtype, name="conv")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if len(shape) == 5:
            x = x.reshape(shape[0], shape[1], shape[2] // 2, shape[3] // 2, -1)
        return x


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference rstt_layers.py:116-132)."""
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        hidden = self.hidden_features or in_f
        out = self.out_features or in_f
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(out, dtype=self.dtype, name="fc2")(x)


class WindowAttention3D(nn.Module):
    """W-MSA / W-MCA over joint spatio-temporal window tokens with 3D relative
    position bias (reference rstt_layers.py:134-234).

    I/O: q [B*nW, N1, C], optional kv [B*nW, N2, C],
    optional additive mask [nW, N1, N2] (numpy or jnp constant).
    """
    dim: int
    num_frames_q: int
    num_frames_kv: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, kv: Optional[jnp.ndarray] = None,
                 mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        kv = q if kv is None else kv
        Bn, N1, C = q.shape
        N2 = kv.shape[1]
        h = self.num_heads
        hd = C // h
        scale = self.qk_scale or hd ** -0.5

        wh, ww = self.window_size
        table_size = (2 * self.num_frames_q - 1) * (2 * wh - 1) * (2 * ww - 1)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            (table_size, h), jnp.float32)

        qp = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(q)
        kvp = nn.Dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(kv)
        qp = qp.reshape(Bn, N1, h, hd) * scale
        k = kvp[..., :C].reshape(Bn, N2, h, hd)
        v = kvp[..., C:].reshape(Bn, N2, h, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", qp, k,
                          preferred_element_type=jnp.float32)

        idx = relative_position_index(self.num_frames_q, self.num_frames_kv,
                                      (wh, ww))  # [N1, N2] numpy
        bias = bias_table[idx.reshape(-1)].reshape(N1, N2, h)
        bias = bias.transpose(2, 0, 1).astype(attn.dtype)  # [h, N1, N2]
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask, attn.dtype)
            attn = attn.reshape(Bn // nW, nW, h, N1, N2) + m[None, :, None]
            attn = attn.reshape(Bn, h, N1, N2)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(Bn, N1, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SWTransformerBlock(nn.Module):
    """(Shifted-)window spatio-temporal transformer block on [B, T, H, W, C].

    Self-attention variant == reference VSTSREncoderTransformerBlock
    (rstt_layers.py:236-338).  With `cross=True` it adds the second
    cross-attention stage of VSTSRDecoderTransformerBlock (:340-497).
    """
    dim: int
    num_heads: int
    num_frames: int
    window_size: Tuple[int, int] = (8, 8)
    shift_size: Tuple[int, int] = (0, 0)
    mlp_ratio: float = 4.0
    cross: bool = False
    num_frames_kv: Optional[int] = None
    dtype: Dtype = jnp.float32

    def _run_windowed(self, attn_mod, x, kv, window, shift, mask):
        """Pad -> cyclic shift -> partition -> attend -> reverse -> crop."""
        B, T, H, W, C = x.shape
        pad_b = (window[0] - H % window[0]) % window[0]
        pad_r = (window[1] - W % window[1]) % window[1]
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            if kv is not None:
                kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        shifted = any(s > 0 for s in shift)
        if shifted:
            x = jnp.roll(x, (-shift[0], -shift[1]), axis=(2, 3))
            if kv is not None:
                kv = jnp.roll(kv, (-shift[0], -shift[1]), axis=(2, 3))
        else:
            mask = None

        xw = window_partition(x, window)
        kvw = window_partition(kv, window) if kv is not None else None
        out = attn_mod(xw, kvw, mask=mask)
        out = window_reverse(out, window, B, T, Hp, Wp)

        if shifted:
            out = jnp.roll(out, (shift[0], shift[1]), axis=(2, 3))
        if pad_b or pad_r:
            out = out[:, :, :H, :W, :]
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_kv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        window, shift = effective_window_shift((H, W), self.window_size,
                                               self.shift_size)
        Hp = -(-H // window[0]) * window[0]
        Wp = -(-W // window[1]) * window[1]
        mask = (shifted_window_mask(T, Hp, Wp, window, shift)
                if any(s > 0 for s in shift) else None)

        attn1 = WindowAttention3D(
            dim=C, num_frames_q=T, num_frames_kv=T, window_size=window,
            num_heads=self.num_heads, dtype=self.dtype, name="attn1")

        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = self._run_windowed(attn1, h, None, window, shift, mask)
        x = shortcut + h

        if self.cross:
            T2 = attn_kv.shape[1]
            # cross mask [nW, N1, N2]: shift labels are identical per frame,
            # so the (T1, T2) cross mask is a T1xT2 tiling of the spatial mask
            mask_qkv = None
            if mask is not None:
                N_sp = window[0] * window[1]
                sp = np.asarray(mask)[:, :N_sp, :N_sp]
                mask_qkv = np.tile(sp, (1, T, T2))
            attn2 = WindowAttention3D(
                dim=C, num_frames_q=T, num_frames_kv=T2, window_size=window,
                num_heads=self.num_heads, dtype=self.dtype, name="attn2")
            shortcut = x
            # LN names follow the reference decoder block (norm2 for the
            # cross query, norm_kv, norm3 for the FFN — rstt_layers.py:390-392)
            h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
            kvn = nn.LayerNorm(dtype=self.dtype, name="norm_kv")(attn_kv)
            h = self._run_windowed(attn2, h, kvn, window, shift, mask_qkv)
            x = shortcut + h

        ffn_norm = "norm3" if self.cross else "norm2"
        h = nn.LayerNorm(dtype=self.dtype, name=ffn_norm)(x)
        h = Mlp(hidden_features=int(C * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(h)
        return x + h


class EncoderLayer(nn.Module):
    """Stack of `depth` SW-MSA blocks, alternating shift (0 / window//2)
    (reference rstt_layers.py:499-575).  I/O: [B, T, H, W, C].

    With `use_pallas`, inference runs each block through the fused VMEM
    kernel in ops/pallas_attn.py (same params, bf16 numerics); init and
    training always use the XLA path.
    """
    dim: int
    depth: int
    num_heads: int
    num_frames: int
    window_size: Tuple[int, int] = (8, 8)
    mlp_ratio: float = 4.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = tuple(w // 2 for w in self.window_size)
        B, T, H, W, C = x.shape
        fused_ok = (self.use_pallas and not self.is_initializing()
                    and H % self.window_size[0] == 0
                    and W % self.window_size[1] == 0)
        if fused_ok:
            return self._fused(x)
        for i in range(self.depth):
            x = SWTransformerBlock(
                dim=self.dim, num_heads=self.num_heads,
                num_frames=self.num_frames, window_size=self.window_size,
                shift_size=(0, 0) if i % 2 == 0 else half,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                name=f"blocks_{i}")(x)
        return x

    def _fused(self, x: jnp.ndarray) -> jnp.ndarray:
        import os
        from pgtformer_tpu.ops.pallas_attn import (fused_sw_block_tokens,
                                                   fused_sw_block_5d)

        B, T, H, W, C = x.shape
        win = self.window_size
        half = tuple(w // 2 for w in win)
        nW = (H // win[0]) * (W // win[1])
        N = T * win[0] * win[1]
        params = self.variables["params"]
        idx = relative_position_index(T, T, tuple(win))
        # "5d": windows stream straight from the [B,T,H,W,C] layout inside
        # the kernel (BlockSpec row stripes + in-VMEM shift) — no XLA-side
        # partition/reverse/roll traffic.  "tokens": the round-2 kernel on
        # an XLA-partitioned token array.
        from pgtformer_tpu import knobs
        use_5d = (knobs.get("SW_KERNEL") == "5d"
                  and all(w % 2 == 0 for w in win))
        # [no-shift, shift] pairs run as ONE kernel: block-0's result is
        # carried in VMEM scratch instead of round-tripping HBM between
        # blocks (ops/pallas_attn.py pair kernel; bit-identical)
        use_pair = use_5d and knobs.get("SW_PAIR") == "1"

        def block_bias(p):
            table = p["attn1"]["relative_position_bias_table"]
            b = table[idx.reshape(-1)].reshape(N, N, self.num_heads)
            return b.transpose(2, 0, 1)

        i = 0
        while use_pair and i + 1 < self.depth:
            from pgtformer_tpu.ops.pallas_attn import fused_sw_block_pair_5d
            p0 = params[f"blocks_{i}"]
            p1 = params[f"blocks_{i + 1}"]
            mask1 = shifted_window_mask(T, H, W, tuple(win), tuple(half))
            x = fused_sw_block_pair_5d(x, p0, p1, block_bias(p0),
                                       block_bias(p1), mask1,
                                       self.num_heads, tuple(win))
            i += 2
        for i in range(i, self.depth):
            shift = (0, 0) if i % 2 == 0 else half
            p = params[f"blocks_{i}"]
            bias = block_bias(p)
            shifted = any(s > 0 for s in shift)
            mask = (shifted_window_mask(T, H, W, tuple(win), tuple(shift))
                    if shifted else None)
            if use_5d:
                x = fused_sw_block_5d(x, p, bias, mask, self.num_heads,
                                      tuple(win), tuple(shift))
                continue
            h = jnp.roll(x, (-shift[0], -shift[1]), axis=(2, 3)) if shifted else x
            tok = window_partition(h, win)
            tok = fused_sw_block_tokens(tok, p, bias, mask,
                                        self.num_heads, nW)
            h = window_reverse(tok.astype(x.dtype), win, B, T, H, W)
            x = jnp.roll(h, (shift[0], shift[1]), axis=(2, 3)) if shifted else h
        return x


class DecoderLayer(nn.Module):
    """Stack of cross-frame decoder blocks (reference rstt_layers.py:577-662).

    Unused by the deployed PGTFormer (imported but never constructed there —
    reference tdcrqvae3_arch.py:30); kept for component parity."""
    dim: int
    depth: int
    num_heads: int
    num_frames: int
    window_size: Tuple[int, int] = (8, 8)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_kv: jnp.ndarray) -> jnp.ndarray:
        half = tuple(w // 2 for w in self.window_size)
        for i in range(self.depth):
            x = SWTransformerBlock(
                dim=self.dim, num_heads=self.num_heads,
                num_frames=self.num_frames, window_size=self.window_size,
                shift_size=(0, 0) if i % 2 == 0 else half,
                mlp_ratio=self.mlp_ratio, cross=True, dtype=self.dtype,
                name=f"blocks_{i}")(x, attn_kv)
        return x
