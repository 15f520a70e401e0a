"""End-to-end video restoration pipeline (the product path).

Replaces the reference's one-window-at-a-time loop
(reference inference.py:37-74: every output frame pays a full 3-frame
forward through a single-sample batch, and every frame crosses the host
boundary 3x as float32) with:

  * **unique-frame uint8 transfer**: each decoded frame is uploaded exactly
    once, as uint8 (12x less host->device traffic than the naive
    3x-duplicated float32 window batches);
  * **on-device window assembly**: a rolling 2-frame device-side tail is
    concatenated with the new chunk and gathered into [B, T, H, W, C]
    sliding windows inside the jitted step;
  * **batched restoration**: B windows per device step;
  * **async dispatch**: host decode of chunk k+1 overlaps device compute of
    chunk k (2 batches kept in flight);
  * native (C++/libav) or OpenCV decode/encode backends.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pgtformer_tpu.config import PGTFormerConfig, RELEASE_PGTFORMER
from pgtformer_tpu.models.pgtformer import PGTFormer
from pgtformer_tpu.io.video import VideoReader, VideoWriter


def _open_reader(path: str, backend: str):
    if backend in ("native", "auto"):
        try:
            from pgtformer_tpu.io.native import NativeVideoReader
            return NativeVideoReader(path)
        except Exception:
            if backend == "native":
                raise
    return VideoReader(path)


def _open_writer(path: str, fps: float, size_hw, backend: str):
    if backend in ("native", "auto"):
        try:
            from pgtformer_tpu.io.native import NativeVideoWriter
            return NativeVideoWriter(path, fps, size_hw)
        except Exception:
            if backend == "native":
                raise
    return VideoWriter(path, fps, size_hw)


class VideoRestorer:
    """Batched sliding-window restorer around a PGTFormer checkpoint."""

    def __init__(self, variables, cfg: PGTFormerConfig = RELEASE_PGTFORMER,
                 w: float = 1.0, batch_windows: int = 8,
                 dtype=jnp.bfloat16, io_backend: str = "auto",
                 use_pallas: Optional[bool] = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — windows
        are sharded over it for multi-chip serving (batch_windows must be a
        multiple of the axis size)."""
        if use_pallas is None:
            # fused kernels on TPU; XLA path elsewhere (pallas interpret on
            # CPU would be pathologically slow)
            import jax
            use_pallas = jax.default_backend() not in ("cpu",)
        self.cfg = cfg
        self.w = float(w)
        self.batch = batch_windows
        self.model = PGTFormer(cfg, dtype=dtype, use_pallas=use_pallas)
        self.variables = variables
        self.radius = (cfg.vqvae.tf - 1) // 2
        self.io_backend = io_backend
        T = cfg.vqvae.tf
        B = batch_windows
        r = self.radius

        # window i covers frames [i, i+T) of concat(tail(2r), new(B))
        win_idx = np.stack([np.arange(i, i + T) for i in range(B)])

        def step(variables, tail_u8, new_u8):
            """tail [2r, H, W, 3]u8 + new [B, H, W, 3]u8 ->
            (restored middles [B, H, W, 3]u8, new tail)."""
            frames = jnp.concatenate([tail_u8, new_u8], axis=0)
            windows = frames[jnp.asarray(win_idx)]       # [B, T, H, W, 3]u8
            x = windows.astype(jnp.float32) / 255.0
            out, _, _ = self.model.apply(variables, x, w=self.w)
            out = out.reshape(B, T, *out.shape[1:])[:, T // 2]
            out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
            out_u8 = jnp.round(out * 255.0).astype(jnp.uint8)
            return out_u8, frames[-2 * r:] if r else frames[:0]

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert B % mesh.shape["data"] == 0, (
                "batch_windows must divide over the data axis")
            rep = NamedSharding(mesh, P())

            # replicate params; shard the window batch inside the step by
            # constraining the gathered windows
            def step_sharded(variables, tail_u8, new_u8):
                frames = jnp.concatenate([tail_u8, new_u8], axis=0)
                windows = frames[jnp.asarray(win_idx)]
                windows = jax.lax.with_sharding_constraint(
                    windows, NamedSharding(mesh, P("data")))
                x = windows.astype(jnp.float32) / 255.0
                out, _, _ = self.model.apply(variables, x, w=self.w)
                out = out.reshape(B, T, *out.shape[1:])[:, T // 2]
                out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
                out_u8 = jnp.round(out * 255.0).astype(jnp.uint8)
                return out_u8, frames[-2 * r:] if r else frames[:0]

            self.variables = jax.device_put(variables, rep)
            self._step = jax.jit(step_sharded,
                                 out_shardings=(rep, rep))
        else:
            self._step = jax.jit(step)
        self._tail = None
        self._first_chunk_s = None

    def reset(self):
        self._tail = None
        self._first_chunk_s = None

    def restore_chunk(self, new_frames_u8: np.ndarray):
        """new_frames_u8 [B, H, W, 3] uint8 -> [B, H, W, 3] uint8 (async).

        The first chunk must be prefixed by the caller via `prime()`.
        """
        if self._first_chunk_s is None:
            t0 = time.perf_counter()
            out, self._tail = self._step(self.variables, self._tail,
                                         jnp.asarray(new_frames_u8))
            np.asarray(out[0, 0, 0, :1])   # include compile in startup time
            self._first_chunk_s = time.perf_counter() - t0
            return out
        out, self._tail = self._step(self.variables, self._tail,
                                     jnp.asarray(new_frames_u8))
        return out

    def prime(self, first_frame: np.ndarray):
        """Initialize the left padding: duplicate the first frame
        (reference inference.py:41-45)."""
        t = np.repeat(first_frame[None], 2 * self.radius, axis=0)
        self._tail = jnp.asarray(t)

    def restore_video(self, input_path: str, output_path: str,
                      progress: bool = False,
                      frame_callback=None) -> dict:
        """Restore a video file; returns timing/throughput stats.
        `frame_callback(index, rgb_u8)` is invoked per restored frame."""
        reader = _open_reader(input_path, self.io_backend)
        writer = None
        B = self.batch
        r = self.radius
        n_frames = 0
        t0 = time.perf_counter()
        pending: List = []  # (device_out, n_valid)
        self.reset()

        def drain(entry):
            nonlocal writer, n_frames
            dev_out, n_valid = entry
            frames = np.asarray(dev_out)     # sync point
            for f in frames[:n_valid]:
                if writer is None:
                    writer = _open_writer(output_path, reader.fps,
                                          f.shape[:2], self.io_backend)
                writer.write(f)
                if frame_callback is not None:
                    frame_callback(n_frames, f)
                n_frames += 1

        # Alignment: prime() consumes frame 0 into the device tail
        # ([f0]*2r); after that a chunk of B new frames yields exactly B
        # valid restored centers.  At stream end the remaining q frames owe
        # q + r more outputs, produced from last-frame-padded chunks
        # (matches the reference's first/last duplication padding,
        # inference.py:41-74).
        chunk: List[np.ndarray] = []
        last_frame = None

        def flush(n_valid):
            out = self.restore_chunk(np.stack(chunk))
            pending.append((out, n_valid))
            if len(pending) > 2:
                drain(pending.pop(0))

        for frame in iter(reader):
            if last_frame is None:
                self.prime(frame)
                last_frame = frame
                continue
            last_frame = frame
            chunk.append(frame)
            if len(chunk) == B:
                flush(B)
                chunk = []
            if progress and n_frames and len(chunk) == 1 and \
                    n_frames % 64 < B:
                print(f"  {n_frames} frames...", flush=True)

        if last_frame is None:
            reader.close()
            return {"frames": 0, "seconds": 0.0, "fps": 0.0}

        needed = len(chunk) + r
        while needed > 0:
            chunk.extend([last_frame] * (B - len(chunk)))
            n_valid = min(B, needed)
            flush(n_valid)
            needed -= n_valid
            chunk = []
        for entry in pending:
            drain(entry)
        reader.close()
        if writer is not None:
            writer.close()
        dt = time.perf_counter() - t0
        steady = dt - self._first_chunk_s if self._first_chunk_s else dt
        steady_frames = max(n_frames - B, 0)
        return {"frames": n_frames, "seconds": dt,
                "fps": n_frames / dt if dt > 0 else 0.0,
                "compile_seconds": self._first_chunk_s,
                "steady_fps": steady_frames / steady if steady > 0 else 0.0}
