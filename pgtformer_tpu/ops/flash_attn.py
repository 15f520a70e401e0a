"""Pallas TPU kernel: dense multi-head attention for the code-prediction
transformer (reference archs/pgtformer_arch.py:638-643 — 9 layers over
T*32*32 = 3072 tokens, 8 heads of 64).

XLA materializes the [B, H, N, N] fp32 score tensor in HBM three times per
layer (scores, softmax, probs); at N=3072 that is ~2.4 GB of traffic per
layer.  This kernel keeps the whole K/V of one (batch, head) in VMEM
(2 x 3072 x 64 bf16 = 768 KB) and streams 512-row query blocks through a
single-pass softmax — scores never leave VMEM.  No online/recurrence
bookkeeping is needed because the full key axis fits in one block
(unlike generic flash attention, which pays it; the stock
jax.experimental.pallas flash kernel measures 3x slower than XLA at this
small-head geometry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # scale folded into q ([BQ, D]) and normalization applied post-PV
    # ([BQ, D]) — both avoid a full elementwise pass over the [BQ, N]
    # score tile (measured 9% per call, tools/exp_dense_mha.py)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)                  # [N, D]
    v = v_ref[0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _mha_kernel_bnhd(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     num_heads: int):
    """Heads-minor layout: q/k/v refs are [1, BQ|N, h, D] (read per head via
    4D indexing); the output ref is the flat [1, BQ, h*D] packed layout and
    is written as one lane-axis concat (the same pattern the SW kernel
    uses) — so the caller never materializes a [B, h, N, D] transpose."""
    outs = []
    for hi in range(num_heads):
        q = (q_ref[0, :, hi, :].astype(jnp.float32)
             * scale).astype(jnp.bfloat16)             # [BQ, D]
        k = k_ref[0, :, hi, :].astype(jnp.bfloat16)    # [N, D]
        v = v_ref[0, :, hi, :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append((o / denom).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)          # [BQ, h*D]


def _dense_mha_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> jnp.ndarray:
    """Pure-XLA reference (the MultiHeadSelfAttention fallback math) — the
    differentiable body backing dense_mha's custom VJP."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def dense_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
              scale: float, block_q: int = 512, layout: str = "bhnd",
              interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale) v.

    layout="bhnd": q, k, v are [B, H, N, D] (heads already transposed out).
    layout="bnhd": q, k, v are [B, N, H, D] — the free reshape of the
    packed [B, N, C] projections; heads are looped inside the kernel, so
    no [B, H, N, D] transpose copies ever hit HBM (the q/k/v head splits
    were ~0.2 ms x 36 copies per serving step).

    Differentiable: the custom VJP rematerializes through `_dense_mha_ref`,
    so grads equal the stock XLA attention's."""
    assert layout in ("bhnd", "bnhd")

    def fwd_impl(q, k, v):
        if layout == "bnhd":
            return _dense_mha_pallas_bnhd(q, k, v, scale=scale,
                                          block_q=block_q,
                                          interpret=interpret)
        return _dense_mha_pallas(q, k, v, scale=scale, block_q=block_q,
                                 interpret=interpret)

    def ref_impl(a, b, c):
        if layout == "bnhd":
            t = lambda z: z.transpose(0, 2, 1, 3)
            return t(_dense_mha_ref(t(a), t(b), t(c), scale))
        return _dense_mha_ref(a, b, c, scale)

    @jax.custom_vjp
    def f(q, k, v):
        return fwd_impl(q, k, v)

    def f_fwd(q, k, v):
        return fwd_impl(q, k, v), (q, k, v)

    def f_bwd(res, g):
        _, vjp = jax.vjp(ref_impl, *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _dense_mha_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      scale: float, block_q: int = 512,
                      interpret: bool = False) -> jnp.ndarray:
    """The raw kernel forward (no autodiff).

    Requires N % block_q == 0 (3072 deployed); D is MXU-tiled as-is (64
    contracts at half MXU width — padding to 128 doubles FLOPs for the same
    wall time, so we don't)."""
    B, H, N, D = q.shape
    if N % block_q:
        block_q = N  # small geometries (tests): one block
    fold = lambda a: a.reshape(B * H, N, D)
    grid = (B * H, N // block_q)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        interpret=interpret,
    )(fold(q), fold(k), fold(v))
    return out.reshape(B, H, N, D)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _dense_mha_pallas_bnhd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           *, scale: float, block_q: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """Heads-minor forward: q, k, v [B, N, H, D] -> [B, N, H, D]
    (no autodiff; the output is produced in the packed [B, N, H*D] layout
    and reshaped for free)."""
    B, N, H, D = q.shape
    if N % block_q:
        block_q = N
    grid = (B, N // block_q)
    q_spec = pl.BlockSpec((1, block_q, H, D), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, N, H, D), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel_bnhd, scale=scale, num_heads=H),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=pl.BlockSpec((1, block_q, H * D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(B, N, H, D)
