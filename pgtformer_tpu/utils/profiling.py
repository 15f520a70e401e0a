"""Tracing / profiling helpers (the reference has only time.time() smoke
loops — archs/pgtformer_arch.py:752-759; SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Lightweight per-stage wall timing for pipelines.

    NOTE on the axon TPU tunnel: `block_until_ready()` does not wait for
    remote execution; pass a `sync` callable that reads back a small slice.
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            sync()
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_ms": 1e3 * v / self.counts[k]}
                for k, v in self.totals.items()}


def codebook_stats(codes: np.ndarray, n_embed: int) -> dict:
    """Codebook health metrics: usage ratio + perplexity
    (reference tracks these in-arch — vqgan_arch.py:33-40,61-74)."""
    flat = np.asarray(codes).reshape(-1)
    counts = np.bincount(flat, minlength=n_embed).astype(np.float64)
    p = counts / max(counts.sum(), 1)
    nz = p[p > 0]
    perplexity = float(np.exp(-(nz * np.log(nz)).sum()))
    return {"usage_ratio": float((counts > 0).mean()),
            "perplexity": perplexity}
