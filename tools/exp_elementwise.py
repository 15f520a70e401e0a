"""Why do the decoder's elementwise/GN-apply fusions run at ~20% of HBM BW?

trace_pipeline.py (round 3) shows the 512px serving step fully
compute-bound at ~229 ms with 72.7 ms in 'misc' elementwise fusions —
each ~2.4 ms over [24,128,128,256] / [8,512,512,64] bf16 tensors, i.e.
~150-310 GB/s against the v5e's 819 GB/s HBM.  This experiment measures
what bandwidth XLA achieves on these exact shapes for increasingly rich
fusion bodies, to locate the loss (shape/layout vs fusion content vs
fp32 math width).

Usage: python tools/exp_elementwise.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_PEAK = 819e9  # v5e


def timeit(fn, args, iters, label, traffic_bytes):
    """Time `fn` with the iteration loop INSIDE jit (fori_loop), so the
    tunnel-RPC dispatch overhead (~ms per call on this dev box) is paid
    once per measurement, not once per rep.  The first array argument is
    threaded through the loop carry (perturbed by the op itself where the
    signature allows) so XLA cannot hoist the body out of the loop."""

    def looped(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            # Keep carry shape/dtype: fold the output back in.
            first = jax.tree.leaves(out)[0]
            if first.shape == carry.shape and first.dtype == carry.dtype:
                return first
            # Shape-changing op (e.g. reductions): fold a scalar of the
            # output into the carry so the body is not dead code.
            return carry + first.reshape(-1)[0].astype(carry.dtype)
        return jax.lax.fori_loop(0, iters, body, a[0])

    compiled = jax.jit(looped).lower(*args).compile()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / iters
    bw = traffic_bytes / dt
    print(f"{label:52s} {dt * 1e3:7.3f} ms  {bw / 1e9:6.1f} GB/s "
          f"({100 * bw / HBM_PEAK:4.1f}% peak)")
    return dt


def gn_apply(x, mu, var, scale, bias, eps=1e-6):
    """The production GN-apply: fp32 math, bf16 in/out; mu/var [N,C//g]->
    broadcast per group.  Here mu/var arrive per (N, C) pre-broadcast like
    the profiled fusions (f32[24,256] operands)."""
    xf = x.astype(jnp.float32)
    y = (xf - mu[:, None, None, :]) * jax.lax.rsqrt(var[:, None, None, :] + eps)
    y = y * scale + bias
    return y.astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for shape in [(24, 128, 128, 256), (8, 512, 512, 64), (8, 256, 256, 128)]:
        N, H, W, C = shape
        nbytes = int(np.prod(shape)) * 2
        x = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
        x2 = jnp.asarray(rng.normal(size=shape), dtype=jnp.bfloat16)
        mu = jnp.asarray(rng.normal(size=(N, C)), dtype=jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2.0, size=(N, C)),
                          dtype=jnp.float32)
        sc = jnp.asarray(rng.normal(size=(C,)), dtype=jnp.float32)
        bi = jnp.asarray(rng.normal(size=(C,)), dtype=jnp.float32)
        print(f"\n== {shape} bf16 ({nbytes / 1e6:.0f} MB/tensor) ==")

        timeit(lambda a: a + jnp.bfloat16(1), (x,), args.iters,
               "copy-ish: x + 1", 2 * nbytes)
        timeit(lambda a, b: a + b, (x, x2), args.iters,
               "residual add: x + y", 3 * nbytes)
        timeit(lambda a: jax.nn.silu(a.astype(jnp.float32)).astype(a.dtype),
               (x,), args.iters, "silu (fp32 math)", 2 * nbytes)
        timeit(lambda a, m, v, s, b: gn_apply(a, m, v, s, b),
               (x, mu, var, sc, bi), args.iters,
               "gn-apply (fp32 math)", 2 * nbytes)
        timeit(lambda a, m, v, s, b: jax.nn.silu(
                   gn_apply(a, m, v, s, b).astype(jnp.float32)).astype(a.dtype),
               (x, mu, var, sc, bi), args.iters,
               "gn-apply + silu (fp32)", 2 * nbytes)
        timeit(lambda a, m, v, s, b: jax.nn.silu(
                   (a.astype(jnp.bfloat16) - m.astype(jnp.bfloat16)[:, None, None, :])
                   * jax.lax.rsqrt(v.astype(jnp.bfloat16)[:, None, None, :] + jnp.bfloat16(1e-6))
                   * s.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)),
               (x, mu, var, sc, bi), args.iters,
               "gn-apply + silu (bf16 math)", 2 * nbytes)
        timeit(lambda a, b, m, v, s, bb: jax.nn.silu(
                   gn_apply(a + b, m, v, s, bb).astype(jnp.float32)).astype(a.dtype),
               (x, x2, mu, var, sc, bi), args.iters,
               "residual + gn-apply + silu (fp32)", 3 * nbytes)

        # GN stats (two-pass reduction) for reference
        def gn_stats(a, groups=32):
            af = a.astype(jnp.float32).reshape(N, H, W, groups, C // groups)
            m = af.mean(axis=(1, 2, 4))
            v = (af * af).mean(axis=(1, 2, 4)) - m * m
            return m, v
        timeit(gn_stats, (x,), args.iters, "gn-stats reduction", nbytes)


if __name__ == "__main__":
    main()
