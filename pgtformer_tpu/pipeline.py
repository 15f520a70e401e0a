"""End-to-end video restoration pipeline (the product path).

Replaces the reference's one-window-at-a-time loop
(reference inference.py:37-74: every output frame pays a full 3-frame
forward through a single-sample batch) with a batched, async-dispatch
pipeline: N sliding windows per device step, host decode overlapped with
TPU compute via JAX's asynchronous dispatch.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pgtformer_tpu.config import PGTFormerConfig, RELEASE_PGTFORMER
from pgtformer_tpu.models.pgtformer import PGTFormer
from pgtformer_tpu.io.video import (
    VideoReader, VideoWriter, sliding_windows, batched)


class VideoRestorer:
    """Batched sliding-window restorer around a PGTFormer checkpoint."""

    def __init__(self, variables, cfg: PGTFormerConfig = RELEASE_PGTFORMER,
                 w: float = 1.0, batch_windows: int = 4,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.w = float(w)
        self.batch = batch_windows
        self.model = PGTFormer(cfg, dtype=dtype)
        self.variables = variables
        self.radius = (cfg.vqvae.tf - 1) // 2

        def forward(variables, x):
            """x [B, T, H, W, 3] in [0,1] -> restored middle frames
            [B, H, W, 3] uint8 (clamp + scale on device)."""
            out, _, _ = self.model.apply(variables, x, w=self.w)
            B, T = x.shape[:2]
            out = out.reshape(B, T, *out.shape[1:])
            mid = out[:, T // 2]
            mid = jnp.clip(mid.astype(jnp.float32), 0.0, 1.0) * 255.0
            return mid.astype(jnp.uint8)

        self._forward = jax.jit(forward)

    def restore_windows(self, windows_u8: np.ndarray) -> jax.Array:
        """windows_u8 [B, T, H, W, 3] uint8 -> [B, H, W, 3] uint8 (async)."""
        x = jnp.asarray(windows_u8, jnp.float32) / 255.0
        return self._forward(self.variables, x)

    def restore_video(self, input_path: str, output_path: str,
                      progress: bool = False) -> dict:
        """Restore a video file; returns timing/throughput stats."""
        reader = VideoReader(input_path)
        writer: Optional[VideoWriter] = None
        n_frames = 0
        t0 = time.perf_counter()
        pending = []  # (device_array,) queue for async overlap

        def drain(entry):
            nonlocal writer, n_frames
            frames = np.asarray(entry)   # sync point
            for f in frames:
                if writer is None:
                    writer = VideoWriter(output_path, reader.fps,
                                         f.shape[:2])
                writer.write(f)
                n_frames += 1

        for window_batch in batched(
                sliding_windows(iter(reader), self.radius), self.batch):
            arr = np.stack([np.stack(w) for w in window_batch])
            out = self.restore_windows(arr)       # async dispatch
            pending.append(out)
            if len(pending) > 2:                  # keep 2 batches in flight
                drain(pending.pop(0))
            if progress and n_frames and n_frames % 64 == 0:
                print(f"  {n_frames} frames...", flush=True)
        for entry in pending:
            drain(entry)
        reader.close()
        if writer is not None:
            writer.close()
        dt = time.perf_counter() - t0
        return {"frames": n_frames, "seconds": dt,
                "fps": n_frames / dt if dt > 0 else 0.0}
