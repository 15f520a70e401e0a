"""Measure the stage-I train-step time with and without the fused Pallas
SW-block kernels (custom-VJP forward; backward rematerializes through the
XLA reference — ops/pallas_attn.py).

    python tools/bench_train_step.py [--res 512] [--batch 1] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(use_pallas: bool, res: int, batch: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.train.stages import Stage1Trainer, StageHyper

    cfg = RELEASE_PGTFORMER.vqvae
    assert cfg.ddconfig.resolution == res or res != 512, res
    hp = StageHyper(milestones=(10**9,), warmup_iter=-1, total_iter=10**9,
                    gan_start_iter=0)
    trainer = Stage1Trainer(cfg, hp, lpips_fn=None, dtype=jnp.bfloat16,
                            use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (batch, cfg.tf, res, res, 3))
                     .astype(np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), gt)
    step = trainer.make_step()

    state, metrics = step(state, gt)   # compile
    np.asarray(metrics["l_pix"])       # host sync (tunnel-safe)

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, gt)
        np.asarray(metrics["l_pix"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--mode", choices=["xla", "pallas", "both"],
                    default="both",
                    help="one variant per process keeps each run inside a "
                         "single big-compile budget")
    args = ap.parse_args()

    if args.mode in ("xla", "both"):
        t = bench(False, args.res, args.batch, args.iters)
        print(f"stage-I step (XLA towers):    {t * 1e3:.1f} ms")
    if args.mode in ("pallas", "both"):
        t = bench(True, args.res, args.batch, args.iters)
        print(f"stage-I step (Pallas towers): {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
