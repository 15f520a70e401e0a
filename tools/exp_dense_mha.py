"""Variant sweep for the dense-MHA Pallas kernel at serving geometry.

roofline_step.py: ~2.29 ms per call x 9.5 calls = ~21.7 ms/step vs a
~1.5 ms half-MXU analytic bound (B=8, H=8, N=3072, D=64).  The softmax
over [512, 3072] fp32 dominates per-program VPU time.  Variants:
post-PV normalization (divide the [512,64] output instead of the
[512,3072] probs — same fp32 math reordered), bf16 exp, larger
query blocks, and the softmax row-sum as an MXU ones-dot (the LN trick
from the SW kernel).

Round-3 verdicts (v5e via tunnel, production@2.95ms that run): postnorm
+prescale is the production formulation (landed round-3b).  mxu-sum is a
NEGATIVE result — the fp32 [512,3072]@[3072,8] ones-dot costs 17.3ms at
block_q=512 (Mosaic relayout of the fp32 e tile into MXU operand layout
dwarfs the cross-lane reduce it replaces); the bf16-e variant is 3.7ms,
still a loss.  Unlike LN's [M,C] operand (already MXU-laid-out), the
score tile lives in VPU layout and the relayout IS the cost.

Usage: python tools/exp_dense_mha.py [--iters 30]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pgtformer_tpu.ops import flash_attn

B, H, N, D = 8, 8, 3072, 64
SCALE = D ** -0.5


def timeit(fn, args, iters, label):
    def looped(q, k, v):
        def body(_, c):
            return fn(c, k, v).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    compiled = jax.jit(looped).lower(*args).compile()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:7.3f} ms")
    return dt


def mha_variant(kernel_body, block_q=512):
    def run(q, k, v):
        fold = lambda a: a.reshape(B * H, N, D)
        grid = (B * H, N // block_q)
        out = pl.pallas_call(
            functools.partial(kernel_body, scale=SCALE),
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
        )(fold(q), fold(k), fold(v))
        return out.reshape(B, H, N, D)
    return run


def k_postnorm(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_postnorm_prescaled(q_ref, k_ref, v_ref, o_ref, *, scale):
    # fold the scale into q once ([512,64] instead of [512,3072])
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
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


def k_bf16exp(q_ref, k_ref, v_ref, o_ref, *, scale):
    # exp and probs in bf16 (sum in fp32) — parity-risky, measured only
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s.astype(jnp.bfloat16))
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_mxusum(q_ref, k_ref, v_ref, o_ref, *, scale):
    # softmax row-sum as an MXU dot against ones (the LN trick from the
    # SW kernel): replaces the 3072-lane cross-lane VPU reduce with a
    # [512,3072]@[3072,8] dot that overlaps the PV matmul
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    ones = jnp.ones((e.shape[-1], 8), jnp.float32)
    denom = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[:, :1]
    o = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_mxusum_bf16(q_ref, k_ref, v_ref, o_ref, *, scale):
    # mxusum with the denominator dot in bf16 (e is cast for PV anyway;
    # sum of 3072 positives in bf16 accumulates fp32 on the MXU)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s).astype(jnp.bfloat16)
    ones = jnp.ones((e.shape[-1], 8), jnp.bfloat16)
    denom = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[:, :1]
    o = jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, N, D)),
                             dtype=jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    timeit(lambda a, b, c: flash_attn._dense_mha_pallas(
        a, b, c, scale=SCALE), (q, k, v), args.iters, "production (bhnd)")
    for label, body in [("postnorm", k_postnorm),
                        ("postnorm+prescale", k_postnorm_prescaled),
                        ("bf16 exp", k_bf16exp),
                        ("mxu-sum", k_mxusum),
                        ("mxu-sum bf16e", k_mxusum_bf16)]:
        for bq in (512, 1024):
            try:
                timeit(mha_variant(body, bq), (q, k, v), args.iters,
                       f"{label} block_q={bq}")
            except Exception as e:
                print(f"{label} block_q={bq}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")

    # numeric deltas vs production
    y0 = np.asarray(flash_attn._dense_mha_pallas(q, k, v, scale=SCALE),
                    dtype=np.float32)
    for label, body in [("postnorm+prescale", k_postnorm_prescaled),
                        ("bf16 exp", k_bf16exp),
                        ("mxu-sum", k_mxusum),
                        ("mxu-sum bf16e", k_mxusum_bf16)]:
        y1 = np.asarray(mha_variant(body)(q, k, v), dtype=np.float32)
        err = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
        print(f"{label} max rel err vs production: {err:.2e}")


if __name__ == "__main__":
    main()
