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
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_kernel(num_heads: int, head_dim: int, c_model: int,
                  n_tokens: int, wblk: int, scale: float, masked: bool):
    """Build the kernel body for given static geometry.  `head_dim` may be
    lane-padded (see wrapper); `c_model` is the true model width."""

    def kernel(x_ref, ln1s_ref, ln1b_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
               wp_ref, bp_ref, ln2s_ref, ln2b_ref, wf1_ref, bf1_ref,
               wf2_ref, bf2_ref, bias_ref, *rest):
        if masked:
            mask_ref, o_ref = rest
        else:
            (o_ref,) = rest
        C = c_model
        Cq = num_heads * head_dim
        N = n_tokens
        x = x_ref[:]                                   # [WBLK*N, C] bf16
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
            if masked:
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
        o_ref[:] = (x2 + f).astype(o_ref.dtype)

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
