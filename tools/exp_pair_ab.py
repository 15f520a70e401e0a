"""Interleaved in-process A/B: paired SW kernel on vs off (VERDICT r3 #2).

Two sequential bench.py runs measured SW_PAIR=1 at 32.4 fps vs SW_PAIR=0
at 35.7 fps — but cross-run tunnel drift is ±5-40% on bandwidth-bound
pieces (BASELINE.md), so this harness compiles BOTH serving steps in one
process and alternates timing windows A/B/A/B... so any tunnel drift hits
both arms equally.

Run on the real chip: python tools/exp_pair_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pgtformer_tpu import knobs
from pgtformer_tpu.config import RELEASE_PGTFORMER
from pgtformer_tpu.models.pgtformer import PGTFormer
from pgtformer_tpu.pipeline import VideoRestorer

B = 8
ITERS = 10
ROUNDS = 4


def build(pair: str, variables, cfg, chunk):
    knobs.set_knob("SW_PAIR", pair)
    r = VideoRestorer(variables, cfg, w=1.0, batch_windows=B,
                      dtype=jnp.bfloat16)
    r.prime(chunk[0])
    tail0 = r._tail
    chunk_dev = jnp.asarray(chunk)
    out, _ = r._step(r.variables, tail0, chunk_dev)   # compile + warm
    np.asarray(out[0, 0, 0, :1])
    return r, tail0, chunk_dev


def window(r, tail0, chunk_dev, pair):
    # Re-assert this arm's knob before timing: _step captures SW_PAIR at
    # trace time, so a retrace inside the window (new shape/dtype, cache
    # eviction) must re-read the intended value, not the other arm's.
    knobs.set_knob("SW_PAIR", pair)
    tail = tail0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, tail = r._step(r.variables, tail, chunk_dev)
    np.asarray(out[0, 0, 0, :1])                      # honest tunnel sync
    return (time.perf_counter() - t0) / ITERS


def main():
    cfg = RELEASE_PGTFORMER
    model = PGTFormer(cfg, dtype=jnp.bfloat16, use_pallas=True)
    res = cfg.vqvae.ddconfig.resolution
    T = cfg.vqvae.tf
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
    chunk = rng.integers(0, 256, (B, res, res, 3), dtype=np.uint8)

    print("compiling SW_PAIR=1 ...", flush=True)
    a = build("1", variables, cfg, chunk)
    print("compiling SW_PAIR=0 ...", flush=True)
    b = build("0", variables, cfg, chunk)

    ta, tb = [], []
    for i in range(ROUNDS):
        # Alternate arm order per round so monotonic within-round drift
        # (clock ramp, thermal) cancels instead of biasing one arm.
        if i % 2 == 0:
            ta.append(window(*a, "1"))
            tb.append(window(*b, "0"))
        else:
            tb.append(window(*b, "0"))
            ta.append(window(*a, "1"))
        print(f"round {i}: pair={ta[-1]*1e3:7.1f} ms  "
              f"nopair={tb[-1]*1e3:7.1f} ms", flush=True)

    sa, sb = min(ta), min(tb)
    print(f"\nbest-of-{ROUNDS}: pair {sa*1e3:.1f} ms ({B/sa:.2f} fps)  "
          f"nopair {sb*1e3:.1f} ms ({B/sb:.2f} fps)  "
          f"pair/nopair step ratio {sa/sb:.3f}")


if __name__ == "__main__":
    main()
