"""Pallas TPU kernel: fused VQ nearest-code lookup.

The XLA path materializes the [N, n_embed] fp32 distance matrix in HBM
(matmul -> add norms -> argmin as separate ops); at the deployed geometry
(N tokens x 1024 codes) that is pure HBM traffic for a reduction whose
result is one int per row.  This kernel streams row blocks through VMEM:
scores = x @ codebook^T and the argmin reduction never leave VMEM.

Distances drop the per-row ||x||^2 term (constant within a row, so the
argmin is unchanged — same trick the reference's addmm formulation builds
on, tdcrqvae3_arch.py:100-119).  fp32 matmul keeps near-tie code choices
aligned with the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(x_ref, c_ref, csq_ref, idx_ref, *, n_codes: int,
               rows: int, lanes: int):
    x = x_ref[:]                                   # [rows, D] fp32
    c = c_ref[:]                                   # [n, D] fp32
    scores = jax.lax.dot_general(
        x, c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [rows, n]
    dist = csq_ref[:] - 2.0 * scores               # [rows, n]
    m = jnp.min(dist, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    # first-minimum tie-break, matching jnp.argmin
    idx = jnp.min(jnp.where(dist <= m, iota, n_codes), axis=-1)
    idx_ref[:] = idx.reshape(rows // lanes, lanes)


def nearest_code_pallas(x: jnp.ndarray, codes: jnp.ndarray,
                        rows_per_block: int = 1024,
                        interpret: bool = False) -> jnp.ndarray:
    """x: [N, D] fp32-like; codes: [n, D] (no padding row) -> int32 [N]."""
    N, D = x.shape
    n, _ = codes.shape
    lanes = 128
    while rows_per_block > lanes and N % rows_per_block:
        rows_per_block //= 2
    if N % rows_per_block or rows_per_block % lanes:
        # geometry doesn't tile; XLA fallback
        x32 = x.astype(jnp.float32)
        c32 = codes.astype(jnp.float32)
        d = (jnp.sum(c32 * c32, -1) - 2.0 * (x32 @ c32.T))
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    x32 = x.astype(jnp.float32)
    c32 = codes.astype(jnp.float32)
    csq = jnp.sum(c32 * c32, axis=-1)

    grid = (N // rows_per_block,)
    out = pl.pallas_call(
        functools.partial(_vq_kernel, n_codes=n, rows=rows_per_block,
                          lanes=lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_block, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block // lanes, lanes),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // lanes, lanes), jnp.int32),
        interpret=interpret,
    )(x32, c32, csq)
    return out.reshape(N)
