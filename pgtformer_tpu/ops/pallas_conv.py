"""Pallas TPU kernels: fused GroupNorm+SiLU+conv3x3 chains for the decoder's
per-frame high-resolution tail.

The serving step's decoder spends a large share of its time NOT in conv
matmuls but in the layout passes around them at 512^2/256^2 with 64/128
channels: each GroupNorm is a separate stats reduction, each SiLU a
separate elementwise pass over ~200-400 MB, and the subpixel upsample's
phase interleave lowers to pad/concat chains (see BASELINE.md per-op
trace).  These kernels run the whole

    upsample -> resblock -> resblock [-> out-head stats]

chain as one HBM pass per conv:

  * GroupNorm is folded to a per-(sample, channel) affine `y = x*a + b`
    whose stats come from the PREVIOUS kernel in the chain — every kernel
    emits per-channel (sum, sum-of-squares) of its own bf16 output as a
    second, grid-accumulated result, so no standalone stats pass ever runs.
  * SiLU is applied in-register between the affine and the conv taps.
  * conv3x3 runs as 9 shifted [rows, C] x [C, Co] MXU matmuls with fp32
    accumulation.  Row halos: the top halo row is carried across the
    sequentially-executed grid in VMEM scratch; the bottom halo rows are a
    tiny strided-slice side input (H/bh rows, not a second full read).
  * the subpixel upsample (see nn/blocks.py Upsample) computes its four
    2x2 phase convs and writes the interleaved 2H x 2W result directly
    from VMEM — no pad/concat interleave in HBM.

Inference-only (the serving path: middle-frame decode); training and init
run the stock XLA modules.  Parity vs the XLA path is pinned by
tests/test_pallas_conv.py in interpreter mode.

Reference for the math being fused: tdcrqvae3_arch.py:577-707 (decoder),
rstt_layers.py:835-911 (resblock), tdcrqvae3_arch.py:34-52 (upsample).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# XLA-side helpers
# --------------------------------------------------------------------------

def channel_stats(x: jnp.ndarray) -> jnp.ndarray:
    """Per-(sample, channel) [sum, sum_sq] of a [N, H, W, C] tensor (f32),
    shaped [N, 2, C] — the chaining format the kernels emit."""
    xf = x.astype(jnp.float32)
    return jnp.stack([jnp.sum(xf, axis=(1, 2)),
                      jnp.sum(xf * xf, axis=(1, 2))], axis=1)


def gn_affine_from_stats(stats: jnp.ndarray, gamma: jnp.ndarray,
                         beta: jnp.ndarray, hw: int, groups: int = 32,
                         eps: float = 1e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold GroupNorm(groups, eps) + affine into per-(sample, channel)
    scale/offset [N, C] from chained per-channel stats [N, 2, C]."""
    N, _, C = stats.shape
    cg = C // groups
    cnt = hw * cg
    s1 = stats[:, 0].reshape(N, groups, cg).sum(-1)
    s2 = stats[:, 1].reshape(N, groups, cg).sum(-1)
    mu = s1 / cnt
    var = s2 / cnt - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(mu, cg, axis=1)
    inv_c = jnp.repeat(inv, cg, axis=1)
    a = inv_c * gamma[None].astype(jnp.float32)
    b = beta[None].astype(jnp.float32) - mu_c * a
    return a, b


def _bot_halo(x: jnp.ndarray, bh: int) -> jnp.ndarray:
    """Rows {bh, 2bh, ...} of x [N, H, W, C] -> [N, H/bh - 1, W, C] (the
    bottom halo row for every row-block except the last)."""
    return x[:, bh::bh]


# --------------------------------------------------------------------------
# fused GN+SiLU+conv3x3 (+shortcut/residual, +stats emission)
# --------------------------------------------------------------------------

def _gsc_kernel(bh, W, C, Co, n_blocks, has_act, has_short, has_res,
                emit_stats, Cs):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)                       # [1, bh, W, C]
        bot_ref = next(it)                     # [1, 1, W, C]
        if has_act:
            a_ref = next(it)                   # [1, 1, C] f32
            b_ref = next(it)
        k_ref = next(it)                       # [3, 3, C, Co]
        bias_ref = next(it)                    # [Co] f32
        if has_short:
            xs_ref = next(it)                  # [1, bh, W, Cs]
            sk_ref = next(it)                  # [Cs, Co]
            sb_ref = next(it)                  # [Co] f32
        if has_res:
            res_ref = next(it)                 # [1, bh, W, Co]
        o_ref = next(it)                       # [1, bh, W, Co]
        if emit_stats:
            st_ref = next(it)                  # [1, 2, Co] f32
        top_scr = next(it)                     # [1, W, C] VMEM scratch

        i = pl.program_id(1)
        x_c = x_ref[0]                                        # [bh, W, C]
        xin = jnp.concatenate([top_scr[:].astype(x_c.dtype), x_c,
                               bot_ref[0].astype(x_c.dtype)],
                              axis=0)                         # [bh+2, W, C]
        # carry my last row as the next block's top halo
        top_scr[:] = x_c[bh - 1:bh]

        if has_act:
            y32 = xin.astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]
            y = (y32 * jax.nn.sigmoid(y32)).astype(jnp.bfloat16)
        else:
            y = xin.astype(jnp.bfloat16)
        # the conv's zero padding applies POST-activation: zero the halo
        # rows at the image boundary (act(0) != 0; `where` also scrubs any
        # garbage in the first block's carried-scratch row)
        zero_row = jnp.zeros_like(y[0:1])
        y = jnp.concatenate(
            [jnp.where(i > 0, y[0:1], zero_row), y[1:bh + 1],
             jnp.where(i < n_blocks - 1, y[bh + 1:], zero_row)], axis=0)
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))             # [bh+2,W+2,C]

        acc = jnp.zeros((bh * W, Co), jnp.float32)
        for di in range(3):
            for dj in range(3):
                tap = yp[di:di + bh, dj:dj + W, :].reshape(bh * W, C)
                acc = acc + jnp.dot(tap, k_ref[di, dj],
                                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[:]
        if has_short:
            xs = xs_ref[0].reshape(bh * W, Cs).astype(jnp.bfloat16)
            acc = acc + jnp.dot(xs, sk_ref[:],
                                preferred_element_type=jnp.float32)
            acc = acc + sb_ref[:]
        if has_res:
            acc = acc + res_ref[0].reshape(bh * W, Co).astype(jnp.float32)

        out = acc.astype(o_ref.dtype)
        o_ref[0] = out.reshape(bh, W, Co)

        if emit_stats:
            of = out.astype(jnp.float32)
            s = jnp.stack([jnp.sum(of, axis=0),
                           jnp.sum(of * of, axis=0)], axis=0)  # [2, Co]
            @pl.when(i == 0)
            def _():
                st_ref[0] = s

            @pl.when(i > 0)
            def _():
                st_ref[0] = st_ref[0] + s

    return kernel


def gn_silu_conv3x3(x: jnp.ndarray,
                    ab: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
                    k: jnp.ndarray, bias: jnp.ndarray, *,
                    shortcut: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]] = None,
                    residual: Optional[jnp.ndarray] = None,
                    emit_stats: bool = True,
                    bh: int = 8,
                    interpret: bool = False):
    """One fused pass: `conv3x3(silu(x*a + b)) [+ xs@sk + sb] [+ residual]`.

    x [N, H, W, C] bf16; ab = (a, b) per-(sample, channel) f32 [N, C] (None
    -> plain conv, no activation); k [3, 3, C, Co]; shortcut = (xs, sk, sb)
    with xs [N, H, W, Cs], sk [Cs, Co] (the 1x1 nin_shortcut); residual
    [N, H, W, Co] added to the output (identity shortcut).

    Returns y [N, H, W, Co] bf16 and, with `emit_stats`, per-channel
    [N, 2, Co] f32 (sum, sum_sq) of the bf16 output for the next GN in the
    chain.  Inference-only (no VJP).
    """
    N, H, W, C = x.shape
    Co = k.shape[-1]
    while H % bh:
        bh //= 2
    nb = H // bh
    has_act = ab is not None
    has_short = shortcut is not None
    has_res = residual is not None
    Cs = shortcut[0].shape[-1] if has_short else 0

    args = [x.astype(jnp.bfloat16)]
    in_specs = [pl.BlockSpec((1, bh, W, C), lambda n, i: (n, i, 0, 0),
                             memory_space=pltpu.VMEM)]
    bots = _bot_halo(x, bh).astype(jnp.bfloat16) if nb > 1 else \
        jnp.zeros((N, 1, W, C), jnp.bfloat16)
    args.append(bots)
    nbh = max(nb - 1, 1)
    in_specs.append(pl.BlockSpec(
        (1, 1, W, C), lambda n, i: (n, jnp.minimum(i, nbh - 1), 0, 0),
        memory_space=pltpu.VMEM))
    if has_act:
        a, b = ab
        args += [a.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None]]
        in_specs += [pl.BlockSpec((1, 1, C), lambda n, i: (n, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    args += [k.astype(jnp.bfloat16), bias.astype(jnp.float32)]
    in_specs += [pl.BlockSpec((3, 3, C, Co), lambda n, i: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((Co,), lambda n, i: (0,),
                              memory_space=pltpu.VMEM)]
    if has_short:
        xs, sk, sb = shortcut
        args += [xs.astype(jnp.bfloat16), sk.astype(jnp.bfloat16),
                 sb.astype(jnp.float32)]
        in_specs += [pl.BlockSpec((1, bh, W, Cs), lambda n, i: (n, i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((Cs, Co), lambda n, i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((Co,), lambda n, i: (0,),
                                  memory_space=pltpu.VMEM)]
    if has_res:
        args.append(residual.astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((1, bh, W, Co),
                                     lambda n, i: (n, i, 0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((N, H, W, Co), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, bh, W, Co), lambda n, i: (n, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if emit_stats:
        out_shapes.append(jax.ShapeDtypeStruct((N, 2, Co), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 2, Co), lambda n, i: (n, 0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = _gsc_kernel(bh, W, C, Co, nb, has_act, has_short, has_res,
                         emit_stats, Cs)
    out = pl.pallas_call(
        kernel,
        grid=(N, nb),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((1, W, C), jnp.bfloat16)],
        interpret=interpret,
    )(*args)
    return tuple(out) if emit_stats else (out, None)


# --------------------------------------------------------------------------
# fused subpixel nearest-up2x + conv3x3 with interleaved write
# --------------------------------------------------------------------------

def _sub_kernel(bh, W, C, n_blocks, emit_stats):
    def kernel(x_ref, bot_ref, k_ref, bias_ref, o_ref, *rest):
        if emit_stats:
            st_ref, top_scr = rest
        else:
            (top_scr,) = rest
        i = pl.program_id(1)
        x_c = x_ref[0]                                        # [bh, W, C]
        top = jnp.where(i > 0, top_scr[:], jnp.zeros_like(top_scr[:]))
        bot = jnp.where(i < n_blocks - 1, bot_ref[0],
                        jnp.zeros_like(bot_ref[0]))
        xin = jnp.concatenate([top.astype(x_c.dtype), x_c,
                               bot.astype(x_c.dtype)], axis=0)
        top_scr[:] = x_c[bh - 1:bh]
        xp = jnp.pad(xin.astype(jnp.bfloat16), ((0, 0), (1, 1), (0, 0)))
        # phase (a, b): out[2r+a, 2w+b] = sum_{u,v} x[r+a+u-1? (pre-summed
        # 2x2 kernels, see nn/blocks.py _subpixel_up_conv)]
        # row taps for a=0: rows {r-1, r} -> xp rows (r .. r+1) with offset 0
        #            for a=1: rows {r, r+1} -> offset 1; same along cols.
        rows = []
        s = jnp.zeros((2, C), jnp.float32)
        for a in (0, 1):
            cols = []
            for b in (0, 1):
                acc = jnp.zeros((bh * W, C), jnp.float32)
                for u in range(2):
                    for v in range(2):
                        tap = xp[a + u:a + u + bh,
                                 b + v:b + v + W, :].reshape(bh * W, C)
                        acc = acc + jnp.dot(
                            tap, k_ref[a, b, u, v],
                            preferred_element_type=jnp.float32)
                acc = (acc + bias_ref[:]).astype(o_ref.dtype)
                if emit_stats:
                    # per-phase stats of the bf16 values keep the f32
                    # temporaries at [bh*W, C] instead of [4*bh*W, C]
                    af = acc.astype(jnp.float32)
                    s = s + jnp.stack([jnp.sum(af, axis=0),
                                       jnp.sum(af * af, axis=0)], axis=0)
                cols.append(acc.reshape(bh, W, C))
            # interleave columns: [bh, W, 2, C] -> [bh, 2W, C]
            rows.append(jnp.stack(cols, axis=2).reshape(bh, 2 * W, C))
        # interleave rows: [bh, 2, 2W, C] -> [2bh, 2W, C]
        o_ref[0] = jnp.stack(rows, axis=1).reshape(2 * bh, 2 * W, C)
        if emit_stats:
            @pl.when(i == 0)
            def _():
                st_ref[0] = s

            @pl.when(i > 0)
            def _():
                st_ref[0] = st_ref[0] + s

    return kernel


def phase_kernels_2x2(k3: jnp.ndarray) -> jnp.ndarray:
    """Pre-sum a 3x3 kernel into the four parity-class 2x2 kernels of the
    nearest-up2x + conv3x3 rewrite (same math as nn/blocks.py
    _subpixel_up_conv): returns [2(a), 2(b), 2(u), 2(v), C, Co] f32."""
    k3 = k3.astype(jnp.float32)

    def pair(k, a, axis):
        s0, s1, s2 = (jnp.take(k, i, axis=axis) for i in range(3))
        if a == 0:
            return jnp.stack([s0, s1 + s2], axis=axis)
        return jnp.stack([s0 + s1, s2], axis=axis)

    per_a = []
    for a in (0, 1):
        ka = pair(k3, a, 0)
        per_b = []
        for b in (0, 1):
            per_b.append(pair(ka, b, 1))       # [2, 2, C, Co]
        per_a.append(jnp.stack(per_b, axis=0))
    return jnp.stack(per_a, axis=0)            # [2, 2, 2, 2, C, Co]


def subpixel_up_conv3x3(x: jnp.ndarray, k3: jnp.ndarray, bias: jnp.ndarray,
                        *, emit_stats: bool = True, bh: int = 8,
                        interpret: bool = False):
    """conv3x3(nearest_up2(x)) with direct interleaved write.

    x [N, H, W, C] -> [N, 2H, 2W, C] bf16 (+ chained stats [N, 2, C]).
    `k3` is the stock 3x3 conv kernel; the 2x2 phase kernels are derived
    at trace time.  Inference-only.
    """
    N, H, W, C = x.shape
    while H % bh:
        bh //= 2
    nb = H // bh
    k2 = phase_kernels_2x2(k3).astype(jnp.bfloat16)
    bots = _bot_halo(x, bh).astype(jnp.bfloat16) if nb > 1 else \
        jnp.zeros((N, 1, W, C), jnp.bfloat16)
    nbh = max(nb - 1, 1)
    out_shapes = [jax.ShapeDtypeStruct((N, 2 * H, 2 * W, C), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, 2 * bh, 2 * W, C),
                              lambda n, i: (n, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if emit_stats:
        out_shapes.append(jax.ShapeDtypeStruct((N, 2, C), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 2, C), lambda n, i: (n, 0, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _sub_kernel(bh, W, C, nb, emit_stats),
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec((1, bh, W, C), lambda n, i: (n, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, C),
                         lambda n, i: (n, jnp.minimum(i, nbh - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 2, 2, C, C), lambda n, i: (0,) * 6,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda n, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((1, W, C), jnp.bfloat16)],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), bots, k2, bias.astype(jnp.float32))
    return tuple(out) if emit_stats else (out, None)


# --------------------------------------------------------------------------
# the chained tail: upsample -> resblock -> resblock -> out-head affine
# --------------------------------------------------------------------------

def fused_decoder_tail(h: jnp.ndarray, p_up: dict, p_b0: dict, p_b1: dict,
                       p_norm_out: dict, *, groups: int = 32,
                       interpret: bool = False):
    """The per-frame middle-only decoder tail as a chain of fused kernels:

        up = subpixel_up(h)                     (up_X_upsample/conv)
        b0 = resblock(up)   128 -> 64           (up_0_block_0, nin shortcut)
        b1 = resblock(b0)   64  -> 64           (up_0_block_1, identity)
        return silu(gn(b1)) via chained stats   (norm_out affine, conv_out
                                                 left to XLA)

    h [N, H, W, C]; param subtrees use the stock module layouts
    (checkpoint-port parity).  Returns the normalized+silu'd tensor ready
    for conv_out.  Inference-only.
    """
    N, H, W, C = h.shape
    hw4 = (2 * H) * (2 * W)

    up, st = subpixel_up_conv3x3(h, p_up["conv"]["kernel"],
                                 p_up["conv"]["bias"], interpret=interpret)

    def rb(x, stats, p):
        Cin = x.shape[-1]
        Co = p["conv1"]["kernel"].shape[-1]
        a1, b1 = gn_affine_from_stats(stats, p["norm1"]["scale"],
                                      p["norm1"]["bias"], hw4, groups)
        hmid, st1 = gn_silu_conv3x3(x, (a1, b1), p["conv1"]["kernel"],
                                    p["conv1"]["bias"], interpret=interpret)
        a2, b2 = gn_affine_from_stats(st1, p["norm2"]["scale"],
                                      p["norm2"]["bias"], hw4, groups)
        shortcut = None
        residual = None
        if Cin != Co:
            sk = p["nin_shortcut"]["kernel"].reshape(Cin, Co)
            shortcut = (x, sk, p["nin_shortcut"]["bias"])
        else:
            residual = x
        return gn_silu_conv3x3(hmid, (a2, b2), p["conv2"]["kernel"],
                               p["conv2"]["bias"], shortcut=shortcut,
                               residual=residual, interpret=interpret)

    b0, st0 = rb(up, st, p_b0)
    b1_, st1_ = rb(b0, st0, p_b1)

    a, b = gn_affine_from_stats(st1_, p_norm_out["scale"],
                                p_norm_out["bias"], hw4, groups)
    y = (b1_.astype(jnp.float32) * a[:, None, None] + b[:, None, None])
    return jax.nn.silu(y).astype(h.dtype)
