"""Op-class micro-profile of the middle-only fuse decoder (the serving
step's dominant stage: ~213 ms of ~295 ms at B=8 / 6 windows).

Times each decoder piece standalone at its deployed geometry (6 windows,
middle-only slice at the res-256 fuse) with AOT-compiled jits and XLA
cost-analysis FLOPs, so per-piece MFU exposes which op class to fuse next.

Usage:  python tools/profile_decoder.py [--windows 6] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jax_sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, args, iters, label, peak_tfs=197.0):
    compiled = fn.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
    except Exception:
        fl = 0.0
    out = compiled(*args)
    jax_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax_sync(out)
    dt = (time.perf_counter() - t0) / iters
    mfu = fl / dt / (peak_tfs * 1e12) if fl else 0.0
    print(f"{label:44s} {dt * 1e3:8.2f} ms   "
          f"{fl / 1e9:8.1f} GF   mfu {mfu:5.3f}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.nn.blocks import (ResnetBlock, Upsample, EncoderLayer,
                                         group_norm)
    from pgtformer_tpu.models.pgtformer import FuseSftBlock
    import flax.linen as nn

    cfg = RELEASE_PGTFORMER.vqvae.ddconfig
    Bw = args.windows
    T = RELEASE_PGTFORMER.vqvae.tf
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def run(mod, shape, label, n=1, extra=None):
        x = jnp.asarray(rng.normal(size=shape), dt)
        ex = tuple(jnp.asarray(rng.normal(size=s), dt) for s in (extra or ()))
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), x, *ex)

        def f(v, x, *ex):
            h = x
            for _ in range(n):
                h = mod.apply(v, h, *ex)
            return h
        timeit(jax.jit(f), (v, x) + ex, args.iters, f"{label} x{n}")

    # decoder pieces at deployed geometry (middle-only, slice at res-256 fuse)
    # level 4 (res 32, T=3): conv_in 256->512 + mid blocks + 2 up-blocks
    run(ResnetBlock(dtype=dt), (Bw, T, 32, 32, 512), "resblock 512ch @32 T3", n=4)
    run(EncoderLayer(dim=512, depth=cfg.depths[-1], num_heads=cfg.num_heads[-1],
                     num_frames=T, window_size=tuple(cfg.window_sizes[-1]),
                     mlp_ratio=1.0, use_pallas=True, dtype=dt),
        (Bw, T, 32, 32, 512), "attn tower @32 (pallas)", n=3)
    run(Upsample(dtype=dt), (Bw, T, 32, 32, 512), "upsample 512ch 32->64")
    # level 3 (res 64, T=3)
    run(ResnetBlock(out_channels=256, dtype=dt), (Bw, T, 64, 64, 512),
        "resblock 512->256 @64 T3")
    run(ResnetBlock(dtype=dt), (Bw, T, 64, 64, 256), "resblock 256ch @64 T3")
    run(EncoderLayer(dim=256, depth=cfg.depths[3], num_heads=cfg.num_heads[3],
                     num_frames=T, window_size=tuple(cfg.window_sizes[3]),
                     mlp_ratio=1.0, use_pallas=True, dtype=dt),
        (Bw, T, 64, 64, 256), "attn tower @64 (pallas)", n=2)
    run(Upsample(dtype=dt), (Bw, T, 64, 64, 256), "upsample 256ch 64->128")
    # level 2 (res 128, T=3)
    run(ResnetBlock(dtype=dt), (Bw, T, 128, 128, 256),
        "resblock 256ch @128 T3", n=2)
    run(EncoderLayer(dim=256, depth=cfg.depths[2], num_heads=cfg.num_heads[2],
                     num_frames=T, window_size=tuple(cfg.window_sizes[2]),
                     mlp_ratio=1.0, use_pallas=True, dtype=dt),
        (Bw, T, 128, 128, 256), "attn tower @128 (pallas)", n=2)
    run(Upsample(dtype=dt), (Bw, T, 128, 128, 256), "upsample 256ch 128->256")
    # level 1 (res 256, T=3 until fuse slices to 1)
    run(ResnetBlock(out_channels=128, dtype=dt), (Bw, T, 256, 256, 256),
        "resblock 256->128 @256 T3")
    run(ResnetBlock(dtype=dt), (Bw, T, 256, 256, 128),
        "resblock 128ch @256 T3")
    # fuse blocks (middle-only at 256)
    for res, ch in ((32, 512), (64, 256), (128, 256)):
        fm = FuseSftBlock(ch, ch, t=T, dtype=dt)
        e = jnp.asarray(rng.normal(size=(Bw, T, res, res, ch)), dt)
        d = jnp.asarray(rng.normal(size=(Bw, T, res, res, ch)), dt)
        v = jax.jit(fm.init)(jax.random.PRNGKey(0), e, d)
        timeit(jax.jit(lambda v, e, d: fm.apply(v, e, d, w=1.0)),
               (v, e, d), args.iters, f"fuse @{res} T3")
    fm = FuseSftBlock(128, 128, t=T, dtype=dt)
    e = jnp.asarray(rng.normal(size=(Bw, T, 256, 256, 128)), dt)
    d = jnp.asarray(rng.normal(size=(Bw, T, 256, 256, 128)), dt)
    v = jax.jit(fm.init)(jax.random.PRNGKey(0), e, d)
    timeit(jax.jit(lambda v, e, d: fm.apply(v, e, d, w=1.0,
                                            middle_only=True)),
           (v, e, d), args.iters, "fuse @256 middle-only")
    # post-slice (T=1)
    run(Upsample(dtype=dt), (Bw, 1, 256, 256, 128), "upsample 128ch 256->512 T1")
    run(ResnetBlock(out_channels=64, dtype=dt), (Bw, 1, 512, 512, 128),
        "resblock 128->64 @512 T1")
    run(ResnetBlock(dtype=dt), (Bw, 1, 512, 512, 64), "resblock 64ch @512 T1")

    class OutHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = group_norm(dt, "norm_out")(x)
            h = jax.nn.silu(h)
            return nn.Conv(3, (3, 3), padding=1, dtype=dt, name="conv_out")(h)
    run(OutHead(), (Bw, 512, 512, 64), "norm_out+conv_out @512 T1")


if __name__ == "__main__":
    main()
