"""int8 dense-MHA experiment (round-4; VERDICT item 6).

The 9 TransformerSALayers attend densely over T*32*32 = 3072 tokens
(reference pgtformer_arch.py:640-643); the serving-step roofline puts
this bucket at ~21 ms with 0.30 byte-bound efficiency
(tools/roofline_step.py, BASELINE.md round-3).  The round-3 int8 probe
measured the v5e int8 MXU fast path REAL for big dots (1.71x at 8192^3,
tools/exp_int8.py) — this experiment asks whether quantizing the QK^T
and PV contractions to int8 (per-tensor symmetric scales; softmax stays
fp32) beats the bf16 Pallas dense-MHA kernel at the model's exact
geometry, and what it does to predicted code indices.

Timing method: fori_loop-amortized with the full output carried (XLA
cannot slice through the op), host-readback sync (axon's
block_until_ready doesn't wait for remote execution).

Run on the real chip: python tools/exp_int8_mha.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


B, H, N, D = 8, 8, 3072, 64     # serving geometry: 8 windows, 8 heads
SCALE = D ** -0.5
ITERS = 20


def quant_i8(x, axis=None):
    """Symmetric per-tensor int8 quantization; returns (q, scale)."""
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32) + 1e-8
    s = amax / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def mha_bf16_xla(q, k, v):
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * SCALE, k,
                      preferred_element_type=jnp.float32)
    p = jax.nn.softmax(attn, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def mha_int8_qk(q, k, v):
    """int8 QK^T (per-tensor scales), fp32 softmax, bf16 PV."""
    qi, sq = quant_i8(q)
    ki, sk = quant_i8(k)
    s32 = jnp.einsum("bhqd,bhkd->bhqk", qi, ki,
                     preferred_element_type=jnp.int32)
    attn = s32.astype(jnp.float32) * (sq * sk * SCALE)
    p = jax.nn.softmax(attn, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def mha_int8_qkpv(q, k, v):
    """int8 QK^T AND int8 PV (softmax probs quantized with the fixed
    [0,1] range -> scale 1/127; v per-tensor)."""
    qi, sq = quant_i8(q)
    ki, sk = quant_i8(k)
    s32 = jnp.einsum("bhqd,bhkd->bhqk", qi, ki,
                     preferred_element_type=jnp.int32)
    attn = s32.astype(jnp.float32) * (sq * sk * SCALE)
    p = jax.nn.softmax(attn, axis=-1)
    pi = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
    vi, sv = quant_i8(v)
    o32 = jnp.einsum("bhqk,bhkd->bhqd", pi, vi,
                     preferred_element_type=jnp.int32)
    return (o32.astype(jnp.float32) * (sv / 127.0)).astype(jnp.bfloat16)


def mha_pallas(q, k, v):
    from pgtformer_tpu.ops.flash_attn import dense_mha
    return dense_mha(q, k, v, scale=SCALE, block_q=1024)


def _mha_kernel_i8(sq_ref, sk_ref, sv_ref, q_ref, k_ref, v_ref, o_ref, *,
                   scale: float):
    """int8 QK^T + int8 PV inside the VMEM-resident dense-MHA kernel.

    q/k/v refs are pre-quantized int8 [1, BQ|N, D]; per-tensor scales ride
    in SMEM.  Softmax stays fp32; probs are re-quantized with the fixed
    [0,1] range (scale 1/127) — the same VPU pass the bf16 kernel already
    pays for the `e.astype(bf16)` cast."""
    import jax.experimental.pallas as pl  # noqa: F401 (kept local)
    q = q_ref[0]                                       # int8 [BQ, D]
    k = k_ref[0]                                       # int8 [N, D]
    s32 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (sq_ref[0] * sk_ref[0] * scale)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # clip like mha_int8_qkpv: max-subtraction bounds e<=1 today, but a
    # NaN/inf score or a reordered normalization must not overflow int8
    pi = jnp.clip(jnp.round(e * 127.0), 0, 127).astype(jnp.int8)
    o32 = jax.lax.dot_general(pi, v_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o = o32.astype(jnp.float32) * (sv_ref[0] / 127.0) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def mha_pallas_int8(q, k, v, block_q=1024):
    """Pallas dense MHA with both dots on the int8 MXU path: k/v quantized
    once per call (per-tensor), q quantized per call, scores/softmax fp32
    in VMEM, probs int8.  This is the variant that keeps the bf16 kernel's
    no-HBM-scores property (the XLA int8 paths above give it up)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bq, Hq, Nq, Dq = q.shape
    assert Nq % block_q == 0, f"N={Nq} must be a multiple of block_q={block_q}"
    qi, sq = quant_i8(q)
    ki, sk = quant_i8(k)
    vi, sv = quant_i8(v)
    fold = lambda a: a.reshape(Bq * Hq, Nq, Dq)
    grid = (Bq * Hq, Nq // block_q)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel_i8, scale=SCALE),
        grid=grid,
        in_specs=[
            smem, smem, smem,
            pl.BlockSpec((1, block_q, Dq), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nq, Dq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nq, Dq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dq), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq * Hq, Nq, Dq), jnp.bfloat16),
    )(sq.reshape(1), sk.reshape(1), sv.reshape(1), fold(qi), fold(ki),
      fold(vi))
    return out.reshape(Bq, Hq, Nq, Dq)


def time_fn(fn, q, k, v, iters=ITERS):
    @jax.jit
    def loop(q, k, v):
        def body(_, carry):
            # full data dependency (exp_int8.py pattern): the output is
            # q AND k AND v of the next call — self-attention's real data
            # flow — so XLA can neither hoist the k/v quantization out of
            # the loop nor slice through fn
            return fn(carry, carry, carry).astype(carry.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    out = loop(q, k, v)
    np.asarray(out.reshape(-1)[:8])           # warm + sync
    t0 = time.perf_counter()
    out = loop(q, k, v)
    np.asarray(out.reshape(-1)[:8])
    dt = (time.perf_counter() - t0) / iters
    return dt, jax.jit(fn)(q, k, v)


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)
                             ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    ref = np.asarray(mha_bf16_xla(q, k, v), np.float32)
    rows = {}
    for name, fn in [("xla_bf16", mha_bf16_xla),
                     ("pallas_bf16", mha_pallas),
                     ("int8_qk", mha_int8_qk),
                     ("int8_qk_pv", mha_int8_qkpv),
                     ("pallas_int8", mha_pallas_int8)]:
        try:
            dt, out = time_fn(fn, q, k, v)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
            continue
        o = np.asarray(out, np.float32)
        err = float(np.mean(np.abs(o - ref))) / float(np.mean(np.abs(ref)))
        flops = 4 * B * H * N * N * D
        print(f"{name:12s} {dt * 1e3:7.2f} ms/call  "
              f"{flops / dt / 1e12:6.1f} TF/s  rel-L1 {err:.4f}",
              flush=True)
        rows[name] = dt

    if "pallas_bf16" in rows and "int8_qk" in rows:
        print(f"\nspeedup int8_qk vs pallas_bf16: "
              f"{rows['pallas_bf16'] / rows['int8_qk']:.2f}x")
    if "pallas_bf16" in rows and "int8_qk_pv" in rows:
        print(f"speedup int8_qk_pv vs pallas_bf16: "
              f"{rows['pallas_bf16'] / rows['int8_qk_pv']:.2f}x")
    if "pallas_bf16" in rows and "pallas_int8" in rows:
        print(f"speedup pallas_int8 vs pallas_bf16: "
              f"{rows['pallas_bf16'] / rows['pallas_int8']:.2f}x")


if __name__ == "__main__":
    main()
