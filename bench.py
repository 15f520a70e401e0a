"""Benchmark: 512x512 restored frames/sec/chip for the flagship PGTFormer.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` is the real-time factor (value / 30 fps): the reference
publishes no throughput numbers (BASELINE.md — only a self-timing smoke
harness exists), so 30 fps video real-time is the anchor.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.models.pgtformer import PGTFormer

    cfg = RELEASE_PGTFORMER
    model = PGTFormer(cfg, dtype=jnp.bfloat16, use_pallas=True)
    res = cfg.vqvae.ddconfig.resolution
    T = cfg.vqvae.tf
    B = 8  # sliding windows per step; each yields one output frame

    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, T, res, res, 3), jnp.float32),
                           w=1.0))
    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(scale=0.02, size=s.shape).astype(s.dtype))
        if np.issubdtype(s.dtype, np.floating)
        else jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def step(variables, x):
        out, _, _ = model.apply(variables, x, w=1.0)
        out = out.reshape(B, T, res, res, 3)[:, T // 2]
        return jnp.clip(out.astype(jnp.float32), 0, 1)

    x = jnp.asarray(rng.uniform(0, 1, (B, T, res, res, 3)), jnp.float32)
    np.asarray(step(variables, x))  # compile + warm

    # NOTE: on the axon TPU tunnel, block_until_ready() does not actually
    # wait for remote execution; a host readback is the honest sync point.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, x)
    np.asarray(out)
    dt = time.perf_counter() - t0
    fps = B * iters / dt

    print(json.dumps({
        "metric": "pgtformer_512px_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
