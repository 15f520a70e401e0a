"""Pallas TPU kernel: fully fused shifted-window transformer block.

The XLA path runs each SW-MSA block as ~20 separate ops (LN, 3 projections,
batched tiny matmuls, softmax, LN, MLP) with HBM round trips between them;
at 48-token windows those ops are launch/memory-bound, not FLOP-bound.
This kernel executes the ENTIRE block —

    x = x + proj(softmax(q(LN1 x) k(LN1 x)^T * s + rel_bias [+ mask]) v)
    x = x + fc2(gelu(fc1(LN2 x)))

— in VMEM for a tile of windows per grid step, with fp32 LN/softmax and
bf16 matmuls on the MXU.  Heads are processed as unrolled per-head batched
dots (avoids 4D transposes inside the kernel).

Differentiable: `fused_sw_block_tokens` carries a custom VJP whose backward
pass rematerializes the block through `sw_block_tokens_xla` (the pure-XLA
token-level equivalent) and takes its exact gradients — so stages I/III/IV
train through the fused forward with XLA-path-identical grads.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm(x32: jnp.ndarray, scale, bias, eps=1e-5):
    """LN with the channel reductions done on the MXU: sum and sum-of-
    squares via one-pass dots against a ones matrix (fp32 accumulate).
    Cross-lane VPU reductions over C are the single most expensive
    non-matmul op in the fused block (~0.5 ms of an ~8 ms res-128 stripe
    kernel, tools/exp_sw_kernel.py); two skinny [M,C]@[C,8] dots are
    effectively free next to the block's projection GEMMs."""
    n = x32.shape[-1]
    ones = jnp.ones((n, 8), jnp.float32)
    ssum = jax.lax.dot_general(x32, ones, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)[:, :1]
    sqsum = jax.lax.dot_general(x32 * x32, ones, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[:, :1]
    mean = ssum / n
    var = sqsum / n - mean * mean
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_math(x, ln1s_ref, ln1b_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                wp_ref, bp_ref, ln2s_ref, ln2b_ref, wf1_ref, bf1_ref,
                wf2_ref, bf2_ref, bias_ref, mask_ref,
                num_heads, head_dim, c_model, n_tokens, wblk, scale):
    """The fused block math on assembled window tokens [WBLK*N, C] bf16.
    `head_dim` may be lane-padded; `c_model` is the true model width."""
    C = c_model
    Cq = num_heads * head_dim
    N = n_tokens
    x32 = x.astype(jnp.float32)

    h1 = _layer_norm(x32, ln1s_ref[:], ln1b_ref[:]).astype(jnp.bfloat16)
    q = (jnp.dot(h1, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:]).astype(jnp.bfloat16)
    kv = (jnp.dot(h1, wkv_ref[:], preferred_element_type=jnp.float32)
          + bkv_ref[:]).astype(jnp.bfloat16)
    k = kv[:, :Cq]
    v = kv[:, Cq:]

    head_outs = []
    for hi in range(num_heads):
        sl = slice(hi * head_dim, (hi + 1) * head_dim)
        qh = (q[:, sl] * scale).reshape(wblk, N, head_dim)
        kh = k[:, sl].reshape(wblk, N, head_dim)
        vh = v[:, sl].reshape(wblk, N, head_dim)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [WBLK, N, N]
        s = s + bias_ref[hi][None]
        if mask_ref is not None:
            s = s + mask_ref[:]
        s = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        oh = jax.lax.dot_general(
            s, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [WBLK, N, hd]
        head_outs.append(oh.reshape(wblk * N, head_dim))
    attn_out = jnp.concatenate(head_outs, axis=-1)  # [WBLK*N, C]

    proj = (jnp.dot(attn_out.astype(jnp.bfloat16), wp_ref[:],
                    preferred_element_type=jnp.float32) + bp_ref[:])
    x2 = x32 + proj

    h2 = _layer_norm(x2, ln2s_ref[:], ln2b_ref[:]).astype(jnp.bfloat16)
    f = (jnp.dot(h2, wf1_ref[:], preferred_element_type=jnp.float32)
         + bf1_ref[:])
    # Mosaic has no erf/erfc lowering; tanh-approx GELU deviates from
    # the reference's exact GELU by <1e-3 — inside bf16 noise
    f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
    f = (jnp.dot(f, wf2_ref[:], preferred_element_type=jnp.float32)
         + bf2_ref[:])
    return x2 + f


def _block_kernel(num_heads: int, head_dim: int, c_model: int,
                  n_tokens: int, wblk: int, scale: float, masked: bool):
    """Token-domain kernel body (input pre-partitioned by XLA)."""

    def kernel(x_ref, *refs):
        if masked:
            *param_refs, bias_ref, mask_ref, o_ref = refs
        else:
            *param_refs, bias_ref, o_ref = refs
            mask_ref = None
        out = _block_math(x_ref[:], *param_refs, bias_ref, mask_ref,
                          num_heads=num_heads, head_dim=head_dim,
                          c_model=c_model, n_tokens=n_tokens, wblk=wblk,
                          scale=scale)
        o_ref[:] = out.astype(o_ref.dtype)

    return kernel


def sw_block_tokens_xla(x: jnp.ndarray, p: dict, rel_bias: jnp.ndarray,
                        mask: Optional[np.ndarray], num_heads: int,
                        n_windows_per_image: int) -> jnp.ndarray:
    """Pure-XLA token-level equivalent of one SWTransformerBlock applied to
    window tokens [M, N, C] — the same math nn/blocks.py runs (LayerNorm eps
    1e-6, exact GELU, fp32 softmax).  Serves as the differentiable reference
    for the fused kernel's custom VJP and its parity tests."""
    M, N, C = x.shape
    dtype = x.dtype
    h = num_heads
    hd = C // h
    scale = hd ** -0.5
    f32 = jnp.float32

    def ln(z, q):
        zf = z.astype(f32)
        mu = zf.mean(-1, keepdims=True)
        var = ((zf - mu) ** 2).mean(-1, keepdims=True)
        y = (zf - mu) * jax.lax.rsqrt(var + 1e-6)
        return (y * q["scale"] + q["bias"]).astype(dtype)

    a = p["attn1"]
    hx = ln(x, p["norm1"])
    qp = hx @ a["q"]["kernel"].astype(dtype) + a["q"]["bias"].astype(dtype)
    kvp = hx @ a["kv"]["kernel"].astype(dtype) + a["kv"]["bias"].astype(dtype)
    qp = qp.reshape(M, N, h, hd) * scale
    k = kvp[..., :C].reshape(M, N, h, hd)
    v = kvp[..., C:].reshape(M, N, h, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qp, k, preferred_element_type=f32)
    attn = attn + rel_bias[None].astype(f32)
    if mask is not None:
        nW = n_windows_per_image
        m = jnp.asarray(mask, f32)
        attn = attn.reshape(M // nW, nW, h, N, N) + m[None, :, None]
        attn = attn.reshape(M, h, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=f32)
    out = out.reshape(M, N, C).astype(dtype)
    out = (out @ a["proj"]["kernel"].astype(dtype)
           + a["proj"]["bias"].astype(dtype))
    x = x + out
    hx = ln(x, p["norm2"])
    f = (hx @ p["mlp"]["fc1"]["kernel"].astype(dtype)
         + p["mlp"]["fc1"]["bias"].astype(dtype))
    f = jax.nn.gelu(f, approximate=False)
    f = (f @ p["mlp"]["fc2"]["kernel"].astype(dtype)
         + p["mlp"]["fc2"]["bias"].astype(dtype))
    return x + f


def fused_sw_block_tokens(x: jnp.ndarray,
                          block_params: dict,
                          rel_bias: jnp.ndarray,
                          mask: Optional[np.ndarray],
                          num_heads: int,
                          n_windows_per_image: int,
                          wblk: Optional[int] = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Apply the fused block to window tokens (differentiable).

    x: [M, N, C] (M = total windows, N tokens/window); mask [nW, N, N].
    block_params: the SWTransformerBlock param subtree
      {norm1, attn1:{q, kv, proj, relative_position_bias_table},
       norm2, mlp:{fc1, fc2}}.

    Forward runs the fused Pallas kernel; the custom VJP rematerializes
    through `sw_block_tokens_xla`, so grads w.r.t. x, the block params and
    rel_bias equal the XLA path's exactly.
    """

    if wblk is None:
        # 32 windows/step measures ~10% faster than 16 at C<=256; larger
        # tiles exceed the 16 MB scoped-VMEM budget (and C=512 already
        # does at 32)
        wblk = 32 if x.shape[-1] <= 256 else 16

    def fwd_impl(x, p, rb):
        return _pallas_sw_block(x, p, rb, mask, num_heads,
                                n_windows_per_image, wblk, interpret)

    @jax.custom_vjp
    def f(x, p, rb):
        return fwd_impl(x, p, rb)

    def f_fwd(x, p, rb):
        return fwd_impl(x, p, rb), (x, p, rb)

    def f_bwd(res, g):
        _, vjp = jax.vjp(
            lambda x, p, rb: sw_block_tokens_xla(
                x, p, rb, mask, num_heads, n_windows_per_image), *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(x, block_params, rel_bias)


def _pallas_sw_block(x: jnp.ndarray,
                     block_params: dict,
                     rel_bias: jnp.ndarray,
                     mask: Optional[np.ndarray],
                     num_heads: int,
                     n_windows_per_image: int,
                     wblk: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """The raw fused-kernel forward (no autodiff)."""
    M, N, C = x.shape
    hd = C // num_heads
    scale = hd ** -0.5
    nW = n_windows_per_image
    while wblk > 1 and (M % wblk or nW % wblk):
        wblk //= 2
    grid = (M // wblk,)

    p = block_params
    a = p["attn1"]

    # Mosaic compiles 64-wide lane slices pathologically slowly (minutes);
    # zero-pad each head to 128 lanes — numerically identical (padded q/k
    # columns contribute nothing; padded v columns map to zero proj rows).
    hd_p = 128 if hd == 64 else hd
    wq, bq = a["q"]["kernel"], a["q"]["bias"]
    wkv, bkv = a["kv"]["kernel"], a["kv"]["bias"]
    wp = a["proj"]["kernel"]
    if hd_p != hd:
        def pad_cols(w, b):   # [C, h*hd] -> [C, h*hd_p]
            wr = w.reshape(C, num_heads, hd)
            wr = jnp.pad(wr, ((0, 0), (0, 0), (0, hd_p - hd)))
            br = jnp.pad(b.reshape(num_heads, hd),
                         ((0, 0), (0, hd_p - hd)))
            return wr.reshape(C, num_heads * hd_p), br.reshape(-1)
        wq, bq = pad_cols(wq, bq)
        wk_p, bk_p = pad_cols(wkv[:, :C], bkv[:C])
        wv_p, bv_p = pad_cols(wkv[:, C:], bkv[C:])
        wkv = jnp.concatenate([wk_p, wv_p], axis=1)
        bkv = jnp.concatenate([bk_p, bv_p])
        wp = jnp.pad(wp.reshape(num_heads, hd, C),
                     ((0, 0), (0, hd_p - hd), (0, 0)))
        wp = wp.reshape(num_heads * hd_p, C)
    Cq = num_heads * hd_p

    args = [
        x.reshape(M * N, C).astype(jnp.bfloat16),
        p["norm1"]["scale"].astype(jnp.float32),
        p["norm1"]["bias"].astype(jnp.float32),
        wq.astype(jnp.bfloat16),
        bq.astype(jnp.float32),
        wkv.astype(jnp.bfloat16),
        bkv.astype(jnp.float32),
        wp.astype(jnp.bfloat16),
        a["proj"]["bias"].astype(jnp.float32),
        p["norm2"]["scale"].astype(jnp.float32),
        p["norm2"]["bias"].astype(jnp.float32),
        p["mlp"]["fc1"]["kernel"].astype(jnp.bfloat16),
        p["mlp"]["fc1"]["bias"].astype(jnp.float32),
        p["mlp"]["fc2"]["kernel"].astype(jnp.bfloat16),
        p["mlp"]["fc2"]["bias"].astype(jnp.float32),
        rel_bias.astype(jnp.float32),                  # [h, N, N]
    ]

    tok_spec = pl.BlockSpec((wblk * N, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        tok_spec,
        rep((C,)), rep((C,)),
        rep((C, Cq)), rep((Cq,)),
        rep((C, 2 * Cq)), rep((2 * Cq,)),
        rep((Cq, C)), rep((C,)),
        rep((C,)), rep((C,)),
        rep((C, C)), rep((C,)),
        rep((C, C)), rep((C,)),
        rep((num_heads, N, N)),
    ]
    masked = mask is not None
    if masked:
        blocks_per_image = nW // wblk
        args.append(jnp.asarray(mask, jnp.float32))
        in_specs.append(pl.BlockSpec(
            (wblk, N, N), lambda i: (i % blocks_per_image, 0, 0),
            memory_space=pltpu.VMEM))

    kernel = _block_kernel(num_heads, hd_p, C, N, wblk, scale, masked)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((M * N, C), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(M, N, C)


# ---------------------------------------------------------------------------
# 5D-direct variant: windows are loaded straight from [B, T, H, W, C] via
# BlockSpec row-stripes — XLA never materializes the partition (the
# reshape/transpose/copy chain around the token kernel costs ~0.65 ms per
# tensor at res-128 in the serving-step trace, ~21 ms/step total).  The
# half-window shift is handled in-kernel: two half-stripe input specs with
# mod-wrapped row-block indices + an in-VMEM column roll — no jnp.roll in
# the XLA graph at all.
# ---------------------------------------------------------------------------


def _stripe_kernel(num_heads, head_dim, c_model, T, wh, ww, nw, scale,
                   masked, shifted, sw, out_dtype, rps=1):
    """Kernel over a stripe of `rps` window-rows [T, rps*wh, W, C]
    (W = nw*ww).  Larger stripes mean bigger per-program GEMMs and fewer
    grid steps — the projections/MLP of a 48-token window block are
    launch-bound at one window-row per step."""
    N = T * wh * ww
    W = nw * ww
    wblk = rps * nw

    def assemble_row(stripe_row):
        # [T, wh, W, C] -> [nw*N, C] in window-token order (t, h, w)
        t = stripe_row.reshape(T, wh, nw, ww, c_model)
        t = t.transpose(2, 0, 1, 3, 4)          # [nw, T, wh, ww, C]
        return t.reshape(nw * N, c_model)

    def scatter_row(tokens):
        # inverse of assemble_row
        t = tokens.reshape(nw, T, wh, ww, c_model)
        t = t.transpose(1, 2, 0, 3, 4)          # [T, wh, nw, ww, C]
        return t.reshape(T, wh, W, c_model)

    def assemble(stripe):
        # [T, rps*wh, W, C] -> [wblk*N, C], windows row-major (rps, nw).
        # Per-row 5D transposes + concat (a direct 6D transpose trips
        # Mosaic's relayout lowering).
        if rps == 1:
            return assemble_row(stripe)
        rows = [assemble_row(stripe[:, r * wh:(r + 1) * wh])
                for r in range(rps)]
        return jnp.concatenate(rows, axis=0)

    def scatter(tokens):
        # inverse of assemble
        if rps == 1:
            return scatter_row(tokens)
        rows = [scatter_row(tokens[r * nw * N:(r + 1) * nw * N])
                for r in range(rps)]
        return jnp.concatenate(rows, axis=1)

    n_in_x = 2 * rps if shifted else 1
    n_out = 2 * rps if shifted else 1

    def kernel(*refs):
        x_refs = refs[:n_in_x]
        out_refs = refs[len(refs) - n_out:]
        mid = refs[n_in_x:len(refs) - n_out]
        if masked:
            *param_refs, bias_ref, mask_ref = mid
        else:
            *param_refs, bias_ref = mid
            mask_ref = None

        if shifted:
            # rows arrive roll-ordered via the mod-wrapped half-stripe
            # specs; roll the columns in-VMEM
            stripe = jnp.concatenate([r[0] for r in x_refs], axis=1)
            stripe = jnp.concatenate(
                [stripe[:, :, sw:, :], stripe[:, :, :sw, :]], axis=2)
        else:
            stripe = x_refs[0][0]

        mref = None
        if mask_ref is not None:
            mref = mask_ref[:].reshape(wblk, N, N)
        out = _block_math(assemble(stripe).astype(jnp.bfloat16),
                          *param_refs, bias_ref, mref,
                          num_heads=num_heads, head_dim=head_dim,
                          c_model=c_model, n_tokens=N, wblk=wblk, scale=scale)
        y = scatter(out.astype(out_dtype))
        if shifted:
            # inverse column roll, split rows back into the half-stripes
            y = jnp.concatenate([y[:, :, W - sw:, :], y[:, :, :W - sw, :]],
                                axis=2)
            sh = wh // 2
            for j, oref in enumerate(out_refs):
                oref[0] = y[:, j * sh:(j + 1) * sh]
        else:
            out_refs[0][0] = y

    return kernel


def _pick_rps(n_rows: int, nw: int, n_tokens: int, c_model: int,
              num_heads: int) -> int:
    """Stripe height (window-rows per program): largest divisor of n_rows
    whose per-program VMEM footprint stays under budget.

    The block math holds ~22*C + 8*Cq bytes per token of live intermediates
    (fp32 LN/residual/MLP copies + bf16 q/kv with lane-padded head dim), so
    the token count per program — not the stripe bytes — is the binding
    constraint (measured: 3072 tokens at C=256 overflows a 16 MB VMEM)."""
    hd = c_model // num_heads
    hd_p = 128 if hd == 64 else hd
    cq = num_heads * hd_p
    bytes_per_token = 22 * c_model + 8 * cq
    budget = 12 * 1024 * 1024
    best = 1
    for rps in range(1, n_rows + 1):
        if n_rows % rps:
            continue
        tokens = rps * nw * n_tokens
        if tokens * bytes_per_token <= budget:
            best = rps
    return best


def _pallas_sw_block_5d(x, block_params, rel_bias, mask, num_heads,
                        window, shift, interpret=False,
                        rows_per_stripe: Optional[int] = None):
    """Raw 5D fused forward.  x [B, T, H, W, C]; shift must be 0 or
    half-window in both axes."""
    import os
    B, T, H, W, C = x.shape
    wh, ww = window
    sh, sw = shift
    nw = W // ww
    N = T * wh * ww
    hd = C // num_heads
    scale = hd ** -0.5
    shifted = sh > 0 or sw > 0
    assert (not shifted) or (sh * 2 == wh and sw * 2 == ww), (shift, window)
    n_rows = H // wh
    rps = rows_per_stripe
    if rps is None:
        from pgtformer_tpu import knobs
        env = knobs.get("SW_RPS")
        rps = int(env) if env else _pick_rps(n_rows, nw, N, C, num_heads)
    assert n_rows % rps == 0, (n_rows, rps)

    p = block_params
    a = p["attn1"]
    hd_p = 128 if hd == 64 else hd
    wq, bq = a["q"]["kernel"], a["q"]["bias"]
    wkv, bkv = a["kv"]["kernel"], a["kv"]["bias"]
    wp = a["proj"]["kernel"]
    if hd_p != hd:
        def pad_cols(w, b):
            wr = w.reshape(C, num_heads, hd)
            wr = jnp.pad(wr, ((0, 0), (0, 0), (0, hd_p - hd)))
            br = jnp.pad(b.reshape(num_heads, hd), ((0, 0), (0, hd_p - hd)))
            return wr.reshape(C, num_heads * hd_p), br.reshape(-1)
        wq, bq = pad_cols(wq, bq)
        wk_p, bk_p = pad_cols(wkv[:, :C], bkv[:C])
        wv_p, bv_p = pad_cols(wkv[:, C:], bkv[C:])
        wkv = jnp.concatenate([wk_p, wv_p], axis=1)
        bkv = jnp.concatenate([bk_p, bv_p])
        wp = jnp.pad(wp.reshape(num_heads, hd, C),
                     ((0, 0), (0, hd_p - hd), (0, 0)))
        wp = wp.reshape(num_heads * hd_p, C)
    Cq = num_heads * hd_p

    param_args = [
        p["norm1"]["scale"].astype(jnp.float32),
        p["norm1"]["bias"].astype(jnp.float32),
        wq.astype(jnp.bfloat16), bq.astype(jnp.float32),
        wkv.astype(jnp.bfloat16), bkv.astype(jnp.float32),
        wp.astype(jnp.bfloat16), a["proj"]["bias"].astype(jnp.float32),
        p["norm2"]["scale"].astype(jnp.float32),
        p["norm2"]["bias"].astype(jnp.float32),
        p["mlp"]["fc1"]["kernel"].astype(jnp.bfloat16),
        p["mlp"]["fc1"]["bias"].astype(jnp.float32),
        p["mlp"]["fc2"]["kernel"].astype(jnp.bfloat16),
        p["mlp"]["fc2"]["bias"].astype(jnp.float32),
    ]
    rep = lambda shape: pl.BlockSpec(shape, lambda b, r: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    param_specs = [
        rep((C,)), rep((C,)),
        rep((C, Cq)), rep((Cq,)),
        rep((C, 2 * Cq)), rep((2 * Cq,)),
        rep((Cq, C)), rep((C,)),
        rep((C,)), rep((C,)),
        rep((C, C)), rep((C,)),
        rep((C, C)), rep((C,)),
    ]

    # grid order (r, b): b iterates fastest, so the mask block (a function
    # of r only) keeps the same block index across consecutive programs and
    # Mosaic skips its re-fetch — B-1 of every B mask DMAs eliminated.
    grid = (n_rows // rps, B)
    xb = x.astype(jnp.bfloat16)
    masked = mask is not None

    if shifted:
        n_half = H // sh                      # height-sh row blocks
        nhs = 2 * rps                         # half-stripes per program

        def half_spec(j):
            return pl.BlockSpec(
                (1, T, sh, W, C),
                lambda r, b, j=j: (b, 0, (nhs * r + 1 + j) % n_half, 0, 0),
                memory_space=pltpu.VMEM)
        half_specs = [half_spec(j) for j in range(nhs)]
        in_specs = half_specs + param_specs
        args = [xb] * nhs + param_args
        out_specs = tuple(half_specs)
        out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype),) * nhs
    else:
        stripe_spec = pl.BlockSpec(
            (1, T, rps * wh, W, C), lambda r, b: (b, 0, r, 0, 0),
            memory_space=pltpu.VMEM)
        in_specs = [stripe_spec] + param_specs
        args = [xb] + param_args
        out_specs = stripe_spec
        out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)

    args.append(rel_bias.astype(jnp.float32))
    in_specs.append(rep((num_heads, N, N)))
    if masked:
        m = jnp.asarray(mask, jnp.float32).reshape(n_rows, nw, N, N)
        args.append(m)
        in_specs.append(pl.BlockSpec((rps, nw, N, N),
                                     lambda r, b: (r, 0, 0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = _stripe_kernel(num_heads, hd_p, C, T, wh, ww, nw, scale,
                            masked, shifted, sw, x.dtype, rps=rps)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if shifted:
        # each program writes 2*rps disjoint sh-row half-blocks, one per
        # output array: half-block k was written by output j = (k-1) mod
        # (2*rps), i.e. output j holds exactly the rows k % nhs == (j+1)
        # % nhs.  Interleave by strided slices — reads only the written
        # half of each output (the jnp.where form re-read every output in
        # full: ~2x the merge traffic).
        n_half = H // sh
        outs = [oj.reshape(B, T, n_half // nhs, nhs, sh, W, C)
                for oj in out]
        merged = jnp.stack([outs[(i - 1) % nhs][:, :, :, i]
                            for i in range(nhs)], axis=3)
        return merged.reshape(B, T, H, W, C)
    return out


def sw_block_5d_xla(x, p, rel_bias, mask, num_heads, window, shift):
    """XLA reference for the 5D fused block (differentiable): roll ->
    partition -> token block -> reverse -> unroll."""
    from pgtformer_tpu.ops.window import window_partition, window_reverse
    B, T, H, W, C = x.shape
    shifted = any(s > 0 for s in shift)
    h = jnp.roll(x, (-shift[0], -shift[1]), axis=(2, 3)) if shifted else x
    tok = window_partition(h, window)
    nW = (H // window[0]) * (W // window[1])
    tok = sw_block_tokens_xla(tok, p, rel_bias, mask, num_heads, nW)
    h = window_reverse(tok.astype(x.dtype), window, B, T, H, W)
    return jnp.roll(h, (shift[0], shift[1]), axis=(2, 3)) if shifted else h


def fused_sw_block_5d(x, block_params, rel_bias, mask, num_heads,
                      window, shift, interpret=False):
    """Differentiable 5D fused SW block (custom VJP through the XLA path)."""

    def fwd_impl(x, p, rb):
        return _pallas_sw_block_5d(x, p, rb, mask, num_heads, window,
                                   shift, interpret)

    @jax.custom_vjp
    def f(x, p, rb):
        return fwd_impl(x, p, rb)

    def f_fwd(x, p, rb):
        return fwd_impl(x, p, rb), (x, p, rb)

    def f_bwd(res, g):
        _, vjp = jax.vjp(
            lambda x, p, rb: sw_block_5d_xla(x, p, rb, mask, num_heads,
                                             window, shift), *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(x, block_params, rel_bias)


# ---------------------------------------------------------------------------
# Paired variant: the depth-2 EncoderLayer stacks are always [no-shift,
# shift] (reference rstt_layers.py:499-575 alternates shift per depth
# index); running them as two kernels re-writes and re-reads the full
# feature map between blocks — at res-128 the stripe DMA is ~2.3 ms of a
# ~5.6 ms kernel, x6 calls/step.  This kernel computes BOTH blocks per
# stripe: block-0's result is carried across sequential grid steps in a
# VMEM scratch (TPU grids execute in order, scratch persists), so block-1's
# shifted windows — which straddle two adjacent stripes — read the carried
# previous stripe + the current value.  HBM traffic per stripe drops from
# 2x(read+write) to read+write.  One extra grid step per image recomputes
# stripe 0's block-0 for the wrapped last shifted row (1/(R+1) overhead).
# Numerics: block-0's result is cast to x.dtype in scratch — exactly the
# value the two-kernel path round-trips through HBM — so the pair is
# bit-identical to two sequential kernel calls.
# ---------------------------------------------------------------------------


def _pair_kernel(num_heads, head_dim, c_model, T, wh, ww, nw, scale,
                 sw, out_dtype, rps, chunks=1):
    N = T * wh * ww
    W = nw * ww
    S = rps * wh
    wblk = rps * nw
    sh = wh // 2
    nhs = 2 * rps

    def assemble_row(stripe_row):
        t = stripe_row.reshape(T, wh, nw, ww, c_model)
        t = t.transpose(2, 0, 1, 3, 4)
        return t.reshape(nw * N, c_model)

    def scatter_row(tokens):
        t = tokens.reshape(nw, T, wh, ww, c_model)
        t = t.transpose(1, 2, 0, 3, 4)
        return t.reshape(T, wh, W, c_model)

    def assemble(stripe):
        if rps == 1:
            return assemble_row(stripe)
        rows = [assemble_row(stripe[:, r * wh:(r + 1) * wh])
                for r in range(rps)]
        return jnp.concatenate(rows, axis=0)

    def scatter(tokens):
        if rps == 1:
            return scatter_row(tokens)
        rows = [scatter_row(tokens[r * nw * N:(r + 1) * nw * N])
                for r in range(rps)]
        return jnp.concatenate(rows, axis=1)

    def run_block(tokens, params, bias_ref, m):
        """_block_math over the window batch, optionally in `chunks`
        window-chunks to bound live VMEM (per-window math is independent,
        so chunking is exact); block-0 + block-1 intermediates coexist in
        this kernel, ~2x the single-block kernel's footprint."""
        if chunks == 1:
            return _block_math(tokens, *params, bias_ref, m,
                               num_heads=num_heads, head_dim=head_dim,
                               c_model=c_model, n_tokens=N, wblk=wblk,
                               scale=scale)
        step = wblk // chunks
        outs = []
        for ci in range(chunks):
            tok_c = tokens[ci * step * N:(ci + 1) * step * N]
            m_c = None if m is None else m[ci * step:(ci + 1) * step]
            outs.append(_block_math(tok_c, *params, bias_ref, m_c,
                                    num_heads=num_heads, head_dim=head_dim,
                                    c_model=c_model, n_tokens=N, wblk=step,
                                    scale=scale))
        return jnp.concatenate(outs, axis=0)

    def kernel(*refs):
        x_ref = refs[0]
        p0 = refs[1:15]
        p1 = refs[15:29]
        bias0_ref, bias1_ref, mask_ref = refs[29:32]
        out_refs = refs[32:32 + nhs]
        scratch = refs[32 + nhs]

        # carried block-0 rows of the PREVIOUS stripe (read before the
        # overwrite below); garbage on the first grid step per image —
        # that step's block-1 output is rewritten by the final step
        prev_tail = scratch[:, sh:]                   # [T, S-sh, W, C]

        # block 0 (no shift) on this stripe
        stripe = x_ref[0]                             # [T, S, W, C]
        cur = scatter(run_block(
            assemble(stripe).astype(jnp.bfloat16), p0, bias0_ref,
            None)).astype(out_dtype)

        # block 1 (shifted) over rows [(r-1)S+sh, rS+sh): carried tail +
        # this stripe's top; columns rolled in-VMEM
        rows = jnp.concatenate([prev_tail, cur[:, :sh]], axis=1)
        rolled = jnp.concatenate([rows[:, :, sw:], rows[:, :, :sw]], axis=2)
        m = mask_ref[:].reshape(wblk, N, N)
        y = scatter(run_block(
            assemble(rolled).astype(jnp.bfloat16), p1, bias1_ref,
            m)).astype(out_dtype)
        y = jnp.concatenate([y[:, :, W - sw:], y[:, :, :W - sw]], axis=2)
        for j, oref in enumerate(out_refs):
            oref[0] = y[:, j * sh:(j + 1) * sh]

        scratch[:] = cur                              # carry to next step

    return kernel


def _pick_rps_pair(n_rows, nw, n_tokens, c_model, num_heads, T, W, wh):
    """Stripe height for the pair kernel: block-0 and block-1 token
    buffers are live back-to-back and the scratch stripe persists, so the
    budget per program is roughly half the single-block kernel's."""
    hd = c_model // num_heads
    hd_p = 128 if hd == 64 else hd
    cq = num_heads * hd_p
    bytes_per_token = 22 * c_model + 8 * cq
    best = 1
    for rps in range(1, n_rows + 1):
        if n_rows % rps:
            continue
        tokens = rps * nw * n_tokens
        scratch = T * rps * wh * W * c_model * 2   # carried bf16 stripe
        if tokens * bytes_per_token + scratch <= 6 * 1024 * 1024:
            best = rps
    return best


def _pallas_sw_block_pair_5d(x, p0, p1, bias0, bias1, mask1, num_heads,
                             window, interpret=False,
                             rows_per_stripe: Optional[int] = None):
    """Raw fused [no-shift, shift] block pair.  x [B, T, H, W, C]."""
    B, T, H, W, C = x.shape
    wh, ww = window
    sh, sw = wh // 2, ww // 2
    nw = W // ww
    N = T * wh * ww
    hd = C // num_heads
    scale = hd ** -0.5
    n_rows = H // wh
    rps = rows_per_stripe
    if rps is None:
        from pgtformer_tpu import knobs
        env = knobs.get("SW_RPS")
        rps = int(env) if env else _pick_rps_pair(n_rows, nw, N, C,
                                                  num_heads, T, W, wh)
    assert n_rows % rps == 0, (n_rows, rps)
    S = rps * wh
    R = n_rows // rps
    nhs = 2 * rps
    n_half = H // sh
    hd_p = 128 if hd == 64 else hd
    Cq = num_heads * hd_p

    def prep_params(p):
        a = p["attn1"]
        wq, bq = a["q"]["kernel"], a["q"]["bias"]
        wkv, bkv = a["kv"]["kernel"], a["kv"]["bias"]
        wp = a["proj"]["kernel"]
        if hd_p != hd:
            def pad_cols(w, b):
                wr = w.reshape(C, num_heads, hd)
                wr = jnp.pad(wr, ((0, 0), (0, 0), (0, hd_p - hd)))
                br = jnp.pad(b.reshape(num_heads, hd),
                             ((0, 0), (0, hd_p - hd)))
                return wr.reshape(C, num_heads * hd_p), br.reshape(-1)
            wq, bq = pad_cols(wq, bq)
            wk_p, bk_p = pad_cols(wkv[:, :C], bkv[:C])
            wv_p, bv_p = pad_cols(wkv[:, C:], bkv[C:])
            wkv = jnp.concatenate([wk_p, wv_p], axis=1)
            bkv = jnp.concatenate([bk_p, bv_p])
            wp = jnp.pad(wp.reshape(num_heads, hd, C),
                         ((0, 0), (0, hd_p - hd), (0, 0)))
            wp = wp.reshape(num_heads * hd_p, C)
        return [
            p["norm1"]["scale"].astype(jnp.float32),
            p["norm1"]["bias"].astype(jnp.float32),
            wq.astype(jnp.bfloat16), bq.astype(jnp.float32),
            wkv.astype(jnp.bfloat16), bkv.astype(jnp.float32),
            wp.astype(jnp.bfloat16), a["proj"]["bias"].astype(jnp.float32),
            p["norm2"]["scale"].astype(jnp.float32),
            p["norm2"]["bias"].astype(jnp.float32),
            p["mlp"]["fc1"]["kernel"].astype(jnp.bfloat16),
            p["mlp"]["fc1"]["bias"].astype(jnp.float32),
            p["mlp"]["fc2"]["kernel"].astype(jnp.bfloat16),
            p["mlp"]["fc2"]["bias"].astype(jnp.float32),
        ]

    rep = lambda shape: pl.BlockSpec(shape, lambda b, r: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    param_specs = [
        rep((C,)), rep((C,)),
        rep((C, Cq)), rep((Cq,)),
        rep((C, 2 * Cq)), rep((2 * Cq,)),
        rep((Cq, C)), rep((C,)),
        rep((C,)), rep((C,)),
        rep((C, C)), rep((C,)),
        rep((C, C)), rep((C,)),
    ]

    stripe_spec = pl.BlockSpec(
        (1, T, S, W, C), lambda b, r: (b, 0, r % R, 0, 0),
        memory_space=pltpu.VMEM)

    def half_spec(j):
        return pl.BlockSpec(
            (1, T, sh, W, C),
            lambda b, r, j=j: (b, 0, (nhs * (r - 1) + 1 + j) % n_half, 0, 0),
            memory_space=pltpu.VMEM)

    out_specs = tuple(half_spec(j) for j in range(nhs))
    out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype),) * nhs

    m = jnp.asarray(mask1, jnp.float32).reshape(n_rows, nw, N, N)
    args = ([x.astype(jnp.bfloat16)] + prep_params(p0) + prep_params(p1)
            + [bias0.astype(jnp.float32), bias1.astype(jnp.float32), m])
    in_specs = ([stripe_spec] + param_specs + param_specs
                + [rep((num_heads, N, N)), rep((num_heads, N, N)),
                   pl.BlockSpec((rps, nw, N, N),
                                lambda b, r: ((r - 1) % R, 0, 0, 0),
                                memory_space=pltpu.VMEM)])

    # chunk the per-block window batch so block-0 + block-1 intermediates
    # fit scoped VMEM (~16 MB): smallest divisor of wblk whose per-chunk
    # token footprint stays under ~5.5 MB
    wblk = rps * nw
    bytes_per_token = 22 * C + 8 * Cq
    chunks = 1
    for c in range(1, wblk + 1):
        if wblk % c:
            continue
        if (wblk // c) * N * bytes_per_token <= int(5.5 * 1024 * 1024):
            chunks = c
            break

    kernel = _pair_kernel(num_heads, hd_p, C, T, wh, ww, nw, scale, sw,
                          x.dtype, rps, chunks=chunks)
    out = pl.pallas_call(
        kernel,
        grid=(B, R + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((T, S, W, C), x.dtype)],
        interpret=interpret,
    )(*args)
    outs = [oj.reshape(B, T, n_half // nhs, nhs, sh, W, C) for oj in out]
    merged = jnp.stack([outs[(i - 1) % nhs][:, :, :, i]
                        for i in range(nhs)], axis=3)
    return merged.reshape(B, T, H, W, C)


def fused_sw_block_pair_5d(x, p0, p1, bias0, bias1, mask1, num_heads,
                           window, interpret=False):
    """Differentiable fused [no-shift, shift] pair (VJP through the
    two-block XLA path)."""
    half = tuple(w // 2 for w in window)

    def xla_pair(x, p0, p1, b0, b1):
        h = sw_block_5d_xla(x, p0, b0, None, num_heads, window, (0, 0))
        return sw_block_5d_xla(h, p1, b1, mask1, num_heads, window, half)

    def fwd_impl(x, p0, p1, b0, b1):
        return _pallas_sw_block_pair_5d(x, p0, p1, b0, b1, mask1,
                                        num_heads, window, interpret)

    @jax.custom_vjp
    def f(x, p0, p1, b0, b1):
        return fwd_impl(x, p0, p1, b0, b1)

    def f_fwd(x, p0, p1, b0, b1):
        return fwd_impl(x, p0, p1, b0, b1), (x, p0, p1, b0, b1)

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_pair, *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(x, p0, p1, bias0, bias1)
