"""Standalone bench of the fused 5D SW-attention kernel at the serving
geometry, with ablation variants of the in-kernel block math.

roofline_step.py shows the six res-128 SW kernels cost ~5.9-6.0 ms each
(35.8 ms of the 229 ms step) against a ~1.7 ms analytic FLOP bound —
the single largest remaining gap.  Windows are tiny (4x4, N=48 tokens,
8 heads of 32), so the per-head python loop in _block_math slices 32
lanes out of 256 per head (Mosaic relayouts) and issues 48x48 matmuls
with a 32-deep contraction (sub-tile MXU work).  This experiment times
the production kernel, an attention-ablated floor (GEMM/LN/MLP only),
and alternative attention formulations, at [8,3,128,128,256] win(4,4).

Usage: python tools/exp_sw_kernel.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pgtformer_tpu.ops import pallas_attn
from pgtformer_tpu.ops.window import shifted_window_mask

B, T, H, W, C = 8, 3, 128, 128, 256
HEADS = 8
WIN = (4, 4)

if os.environ.get("PGT_EXP_GEOM"):
    # e.g. PGT_EXP_GEOM=8,3,64,64,512 — the res-64 decoder geometry, where
    # hd=64 triggers the Mosaic lane-pad to 128 (2x Q/K/V/proj FLOPs)
    B, T, H, W, C = map(int, os.environ["PGT_EXP_GEOM"].split(","))


def make_params(rng):
    def w(*shape):
        return jnp.asarray(rng.normal(scale=0.02, size=shape),
                           dtype=jnp.float32)
    return {
        "norm1": {"scale": w(C) + 1, "bias": w(C)},
        "attn1": {
            "q": {"kernel": w(C, C), "bias": w(C)},
            "kv": {"kernel": w(C, 2 * C), "bias": w(2 * C)},
            "proj": {"kernel": w(C, C), "bias": w(C)},
        },
        "norm2": {"scale": w(C) + 1, "bias": w(C)},
        "mlp": {
            "fc1": {"kernel": w(C, C), "bias": w(C)},
            "fc2": {"kernel": w(C, C), "bias": w(C)},
        },
    }


def timeit(fn, args, iters, label):
    # carry x through the loop so reps are serialized on device
    def looped(x, *rest):
        def body(_, c):
            return fn(c, *rest).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    compiled = jax.jit(looped).lower(*args).compile()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:7.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="all")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)), dtype=jnp.bfloat16)
    p = make_params(rng)
    N = T * WIN[0] * WIN[1]
    bias = jnp.asarray(rng.normal(scale=0.02, size=(HEADS, N, N)),
                       dtype=jnp.float32)
    mask = shifted_window_mask(T, H, W, WIN, (WIN[0] // 2, WIN[1] // 2))

    run_plain = lambda xx, pp, bb: pallas_attn._pallas_sw_block_5d(
        xx, pp, bb, None, HEADS, WIN, (0, 0))
    run_shift = lambda xx, pp, bb, mm: pallas_attn._pallas_sw_block_5d(
        xx, pp, bb, mm, HEADS, WIN, (WIN[0] // 2, WIN[1] // 2))

    orig_block_math = pallas_attn._block_math

    def bench_pair(tag):
        t0 = timeit(lambda xx: run_plain(xx, p, bias), (x,), args.iters,
                    f"{tag} plain")
        t1 = timeit(lambda xx: run_shift(xx, p, bias, mask), (x,),
                    args.iters, f"{tag} shifted")
        return t0, t1

    print(f"geometry: x={x.shape} win={WIN} heads={HEADS} N={N}")
    bench_pair("v0 production")

    if args.variants == "all" or "copy" in args.variants:
        # raw grid copy with the SAME stripe specs (no assemble/scatter):
        # isolates DMA+launch from the in-VMEM transposes
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        wh = WIN[0]
        n_rows = H // wh
        spec = pl.BlockSpec((1, T, wh, W, C), lambda b, r: (b, 0, r, 0, 0),
                            memory_space=pltpu.VMEM)

        def copy_kernel(x_ref, o_ref):
            o_ref[0] = x_ref[0] + jnp.bfloat16(1)

        def run_copy(xx):
            return pl.pallas_call(
                copy_kernel, grid=(B, n_rows), in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype))(xx)
        timeit(run_copy, (x,), args.iters, "grid-copy (no assemble)")

    # ---- floor: attention replaced by identity (GEMM/LN/MLP cost only)
    def bm_noattn(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                  wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                  num_heads, head_dim, c_model, n_tokens, wblk, scale):
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        attn_out = q + kv[:, :num_heads * head_dim]  # fake, keeps dataflow
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v1: heads batched into one dot_general pair (one relayout
    # instead of 8 lane-slices), softmax normalization folded after PV
    def bm_batched(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                   wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                   num_heads, head_dim, c_model, n_tokens, wblk, scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        # fold (window, head) into ONE batch dim (Mosaic matmul limit)
        to_bh = lambda a: a.reshape(wblk, Nn, num_heads, head_dim).transpose(
            0, 2, 1, 3).reshape(wblk * num_heads, Nn, head_dim)
        qh = to_bh(q * jnp.bfloat16(scale))
        kh = to_bh(kv[:, :Cq])
        vh = to_bh(kv[:, Cq:])
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s.reshape(wblk, num_heads, Nn, Nn) + bias_ref[:][None]
        if mask_ref is not None:
            s = s + mask_ref[:][:, None]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.reshape(wblk * num_heads, Nn, Nn).astype(jnp.bfloat16), vh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = o / denom.reshape(wblk * num_heads, Nn, 1)
        attn_out = o.reshape(wblk, num_heads, Nn, head_dim).transpose(
            0, 2, 1, 3).reshape(wblk * Nn, Cq).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v2: per-head loop kept, but post-PV normalization + bf16 exp
    def bm_postnorm(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                    wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                    num_heads, head_dim, c_model, n_tokens, wblk, scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        k = kv[:, :Cq]
        v = kv[:, Cq:]
        outs = []
        for hi in range(num_heads):
            sl = slice(hi * head_dim, (hi + 1) * head_dim)
            qh = (q[:, sl] * jnp.bfloat16(scale)).reshape(wblk, Nn, head_dim)
            kh = k[:, sl].reshape(wblk, Nn, head_dim)
            vh = v[:, sl].reshape(wblk, Nn, head_dim)
            s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[hi][None]
            if mask_ref is not None:
                s = s + mask_ref[:]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(e.astype(jnp.bfloat16), vh,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o = o / denom
            outs.append(o.reshape(wblk * Nn, head_dim))
        attn_out = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- passthru: assemble/scatter + DMA + launch cost only
    def bm_passthru(x_, *refs, **kw):
        return x_

    # ---- gemm-only: the four GEMMs, no LN / attention / GELU
    def bm_gemmonly(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                    wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                    num_heads, head_dim, c_model, n_tokens, wblk, scale):
        h1 = x_.astype(jnp.bfloat16)
        q = jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
        kv = jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
        attn_out = (q + kv[:, :num_heads * head_dim]).astype(jnp.bfloat16)
        proj = jnp.dot(attn_out, wp[:], preferred_element_type=jnp.float32)
        f = jnp.dot(proj.astype(jnp.bfloat16), wf1[:],
                    preferred_element_type=jnp.float32)
        f = jnp.dot(f.astype(jnp.bfloat16), wf2[:],
                    preferred_element_type=jnp.float32)
        return f

    # ---- floor with bf16 LN apply (stats fp32, normalize bf16)
    def bm_noattn_bf16ln(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s,
                         ln2b, wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                         num_heads, head_dim, c_model, n_tokens, wblk,
                         scale):
        def ln_bf16(z, s_, b_):
            zf = z.astype(jnp.float32)
            mu = zf.mean(axis=-1, keepdims=True)
            var = ((zf - mu) ** 2).mean(axis=-1, keepdims=True)
            inv = (jax.lax.rsqrt(var + 1e-5) ).astype(jnp.bfloat16)
            return ((z - mu.astype(jnp.bfloat16)) * inv
                    * s_.astype(jnp.bfloat16) + b_.astype(jnp.bfloat16))
        h1 = ln_bf16(x_, ln1s[:], ln1b[:])
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        attn_out = q + kv[:, :num_heads * head_dim]
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x_.astype(jnp.float32) + proj
        h2 = ln_bf16(x2.astype(jnp.bfloat16), ln2s[:], ln2b[:])
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f.astype(jnp.bfloat16), approximate=True)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v3: production but explicit softmax ops (ICE bisection)
    def bm_explicit(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                    wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                    num_heads, head_dim, c_model, n_tokens, wblk, scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        k, v = kv[:, :Cq], kv[:, Cq:]
        outs = []
        for hi in range(num_heads):
            sl = slice(hi * head_dim, (hi + 1) * head_dim)
            qh = (q[:, sl] * jnp.bfloat16(scale)).reshape(wblk, Nn, head_dim)
            kh = k[:, sl].reshape(wblk, Nn, head_dim)
            vh = v[:, sl].reshape(wblk, Nn, head_dim)
            s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[hi][None]
            if mask_ref is not None:
                s = s + mask_ref[:]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p_ = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            oh = jax.lax.dot_general(p_, vh, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            outs.append(oh.reshape(wblk * Nn, head_dim))
        attn_out = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v5: all heads stacked into one batched dot pair (no 4D
    # transpose: the batch layout is built by the same lane-slices the
    # production loop already pays, then ONE dot + ONE softmax + ONE dot)
    def bm_stacked(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                   wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                   num_heads, head_dim, c_model, n_tokens, wblk, scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        k, v = kv[:, :Cq], kv[:, Cq:]
        sl = lambda a, hi: a[:, hi * head_dim:(hi + 1) * head_dim].reshape(
            wblk, Nn, head_dim)
        qs = jnp.concatenate([sl(q, hi) * jnp.bfloat16(scale)
                              for hi in range(num_heads)], axis=0)
        ks = jnp.concatenate([sl(k, hi) for hi in range(num_heads)], axis=0)
        vs = jnp.concatenate([sl(v, hi) for hi in range(num_heads)], axis=0)
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s.reshape(num_heads, wblk, Nn, Nn) + bias_ref[:][:, None]
        if mask_ref is not None:
            s = s + mask_ref[:][None]
        s = s.reshape(num_heads * wblk, Nn, Nn)
        p_ = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(p_, vs, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        attn_out = jnp.concatenate(
            [o[hi * wblk:(hi + 1) * wblk].reshape(wblk * Nn, head_dim)
             for hi in range(num_heads)], axis=-1).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v5c: stacked dots WITHOUT bias/mask (ICE bisection + upper
    # bound on the win; numerics intentionally wrong)
    def bm_stacked_nobias(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s,
                          ln2b, wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                          num_heads, head_dim, c_model, n_tokens, wblk,
                          scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        k, v = kv[:, :Cq], kv[:, Cq:]
        sl = lambda a, hi: a[:, hi * head_dim:(hi + 1) * head_dim].reshape(
            wblk, Nn, head_dim)
        qs = jnp.concatenate([sl(q, hi) * jnp.bfloat16(scale)
                              for hi in range(num_heads)], axis=0)
        ks = jnp.concatenate([sl(k, hi) for hi in range(num_heads)], axis=0)
        vs = jnp.concatenate([sl(v, hi) for hi in range(num_heads)], axis=0)
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p_ = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(p_, vs, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        attn_out = jnp.concatenate(
            [o[hi * wblk:(hi + 1) * wblk].reshape(wblk * Nn, head_dim)
             for hi in range(num_heads)], axis=-1).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v6: per-head loop, adds+softmax unchanged, but bias+mask added
    # in bfloat16 (halves VPU width on the score passes)
    def bm_bf16scores(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                      wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                      num_heads, head_dim, c_model, n_tokens, wblk, scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        k, v = kv[:, :Cq], kv[:, Cq:]
        outs = []
        for hi in range(num_heads):
            slc = slice(hi * head_dim, (hi + 1) * head_dim)
            qh = (q[:, slc] * jnp.bfloat16(scale)).reshape(wblk, Nn, head_dim)
            kh = k[:, slc].reshape(wblk, Nn, head_dim)
            vh = v[:, slc].reshape(wblk, Nn, head_dim)
            s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.bfloat16)
            s = s + bias_ref[hi][None].astype(jnp.bfloat16)
            if mask_ref is not None:
                s = s + mask_ref[:].astype(jnp.bfloat16)
            s32 = s.astype(jnp.float32)
            p_ = jax.nn.softmax(s32, axis=-1).astype(jnp.bfloat16)
            oh = jax.lax.dot_general(p_, vh, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            outs.append(oh.reshape(wblk * Nn, head_dim))
        attn_out = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v8: full-C contraction attention.  Per-head scores via
    # head-masked q against the FULL k (zero lanes add exact zeros —
    # bit-identical, 256-deep MXU contraction, no 32-lane slicing); PV as
    # ONE dot of the lane-concatenated probs against a block-diagonal
    # tiled V (full 384-deep x 256-wide MXU work).  Also removes any need
    # for the hd=64->128 pad at C=512 resolutions.
    def bm_maskdot(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                   wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                   num_heads, head_dim, c_model, n_tokens, wblk, scale):
        Cq = num_heads * head_dim
        Nn = n_tokens
        x32 = x_.astype(jnp.float32)
        h1 = pallas_attn._layer_norm(x32, ln1s[:], ln1b[:]).astype(jnp.bfloat16)
        q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
             + bq[:]).astype(jnp.bfloat16)
        kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
              + bkv[:]).astype(jnp.bfloat16)
        k = kv[:, :Cq].reshape(wblk, Nn, Cq)
        v = kv[:, Cq:].reshape(wblk, Nn, Cq)
        qs = (q * jnp.bfloat16(scale)).reshape(wblk, Nn, Cq)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Cq), 2)

        probs = []
        for hi in range(num_heads):
            mh = (lane // head_dim == hi).astype(jnp.bfloat16)
            s = jax.lax.dot_general(qs * mh, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[hi][None]
            if mask_ref is not None:
                s = s + mask_ref[:]
            probs.append(jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16))
        p_cat = jnp.concatenate(probs, axis=-1)        # [wblk, N, h*N]
        vbd_rows = jnp.tile(v, (1, num_heads, 1))       # [wblk, h*N, Cq]
        r_ = jax.lax.broadcasted_iota(jnp.int32, (1, num_heads * Nn, 1), 1)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Cq), 2)
        bmask = (r_ // Nn == c_ // head_dim).astype(jnp.bfloat16)
        vbd = vbd_rows * bmask
        attn_out = jax.lax.dot_general(
            p_cat, vbd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(
                wblk * Nn, Cq).astype(jnp.bfloat16)
        proj = (jnp.dot(attn_out, wp[:],
                        preferred_element_type=jnp.float32) + bp[:])
        x2 = x32 + proj
        h2 = pallas_attn._layer_norm(x2, ln2s[:], ln2b[:]).astype(jnp.bfloat16)
        f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32) + bf1[:])
        f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
        f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32) + bf2[:])
        return x2 + f

    # ---- v9: windows packed P-at-a-time into block-diagonal score dots.
    # Rows/cols per dot go N -> P*N (better MXU tile fill, 1/P the issue
    # count) at the cost of P x attention FLOPs and P^2 x softmax elements;
    # off-diagonal blocks are -1e9 before softmax so the result is exact.
    def make_pack(P):
        def bm_pack(x_, ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
                    wf1, bf1, wf2, bf2, bias_ref, mask_ref,
                    num_heads, head_dim, c_model, n_tokens, wblk, scale):
            Cq = num_heads * head_dim
            Nn = n_tokens
            G = wblk // P
            PN = P * Nn
            x32 = x_.astype(jnp.float32)
            h1 = pallas_attn._layer_norm(x32, ln1s[:],
                                         ln1b[:]).astype(jnp.bfloat16)
            q = (jnp.dot(h1, wq[:], preferred_element_type=jnp.float32)
                 + bq[:]).astype(jnp.bfloat16)
            kv = (jnp.dot(h1, wkv[:], preferred_element_type=jnp.float32)
                  + bkv[:]).astype(jnp.bfloat16)
            k, v = kv[:, :Cq], kv[:, Cq:]
            r_ = jax.lax.broadcasted_iota(jnp.int32, (PN, PN), 0)
            c_ = jax.lax.broadcasted_iota(jnp.int32, (PN, PN), 1)
            offdiag = jnp.where((r_ // Nn) == (c_ // Nn),
                                jnp.float32(0), jnp.float32(-1e9))
            extra = offdiag[None]
            if mask_ref is not None:
                m = mask_ref[:].reshape(G, P, Nn, Nn)
                rows = []
                for pi in range(P):
                    row = [m[:, pi] if pj == pi
                           else jnp.zeros((G, Nn, Nn), jnp.float32)
                           for pj in range(P)]
                    rows.append(jnp.concatenate(row, axis=-1))
                extra = extra + jnp.concatenate(rows, axis=1)
            outs = []
            for hi in range(num_heads):
                slc = slice(hi * head_dim, (hi + 1) * head_dim)
                qh = (q[:, slc] * jnp.bfloat16(scale)).reshape(G, PN,
                                                               head_dim)
                kh = k[:, slc].reshape(G, PN, head_dim)
                vh = v[:, slc].reshape(G, PN, head_dim)
                s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                s = s + jnp.tile(bias_ref[hi], (P, P))[None] + extra
                p_ = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                oh = jax.lax.dot_general(p_, vh, (((2,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
                outs.append(oh.reshape(wblk * Nn, head_dim))
            attn_out = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
            proj = (jnp.dot(attn_out, wp[:],
                            preferred_element_type=jnp.float32) + bp[:])
            x2 = x32 + proj
            h2 = pallas_attn._layer_norm(x2, ln2s[:],
                                         ln2b[:]).astype(jnp.bfloat16)
            f = (jnp.dot(h2, wf1[:], preferred_element_type=jnp.float32)
                 + bf1[:])
            f = jax.nn.gelu(f, approximate=True).astype(jnp.bfloat16)
            f = (jnp.dot(f, wf2[:], preferred_element_type=jnp.float32)
                 + bf2[:])
            return x2 + f
        return bm_pack

    variants = {"passthru": bm_passthru, "gemm-only": bm_gemmonly,
                "floor": bm_noattn, "floor-bf16ln": bm_noattn_bf16ln,
                "v1-batched": bm_batched, "v2-postnorm": bm_postnorm,
                "v3-explicit": bm_explicit, "v5-stacked": bm_stacked,
                "v5c-stacked-nobias": bm_stacked_nobias,
                "v6-bf16scores": bm_bf16scores, "v8-maskdot": bm_maskdot,
                "v9-pack2": make_pack(2), "v9-pack4": make_pack(4),
                "v9-pack8": make_pack(8)}
    want = args.variants.split(",") if args.variants != "all" else variants
    for tag, fn in variants.items():
        if tag not in want:
            continue
        def wrapper(x_, *rest, _fn=fn, **kw):
            return _fn(x_, *rest, **kw)
        pallas_attn._block_math = wrapper
        try:
            bench_pair(tag)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        finally:
            pallas_attn._block_math = orig_block_math

    # numeric check of the most promising variant vs production
    try:
        pallas_attn._block_math = bm_maskdot
        y1 = np.asarray(run_shift(x, p, bias, mask), dtype=np.float32)
        pallas_attn._block_math = orig_block_math
        y0 = np.asarray(run_shift(x, p, bias, mask), dtype=np.float32)
        err = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
        print(f"v1-batched vs production max rel err: {err:.2e}")
    except Exception as e:
        print(f"numeric check FAILED: {type(e).__name__}: {str(e)[:200]}")
    finally:
        pallas_attn._block_math = orig_block_math


if __name__ == "__main__":
    main()
