"""End-to-end video restoration pipeline (the product path).

Replaces the reference's one-window-at-a-time loop
(reference inference.py:37-74: every output frame pays a full 3-frame
forward through a single-sample batch, and every frame crosses the host
boundary 3x as float32) with:

  * **unique-frame uint8 transfer**: each decoded frame is uploaded exactly
    once, as uint8 (12x less host->device traffic than the naive
    3x-duplicated float32 window batches);
  * **per-frame trunk caching**: the strictly per-frame compute (BiSeNet
    parsing prior + the encoder's attention-free high-resolution levels,
    PGTFormer.encode_frames) runs once per unique frame; the rolling
    device-side tail holds the *features* of the 2-frame window overlap, so
    no per-frame work is ever recomputed across windows;
  * **on-device window assembly**: cached per-frame features are gathered
    into [B, T, ...] sliding windows inside the jitted step;
  * **middle-frame-only decoding**: the decoder's high-resolution levels and
    the heavy fuse-SFT convs past the last cross-frame op run only for the
    kept middle frame (the reference decodes all 3 and discards 2 —
    inference.py:15);
  * **batched restoration**: B windows per device step;
  * **async dispatch**: host decode of chunk k+1 overlaps device compute of
    chunk k (`inflight` chunks kept in flight, default 3);
  * **pooled readback**: device->host transfers run in a 2-worker pool so
    they overlap dispatch/decode and each other (high-latency links);
  * **threaded encode**: the CPU-bound video encoder runs in a writer
    thread, overlapping device compute and readback;
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


def _open_writer(path: str, fps: float, size_hw, backend: str,
                 codec: str = "auto"):
    if backend in ("native", "auto"):
        try:
            from pgtformer_tpu.io.native import NativeVideoWriter
            return NativeVideoWriter(path, fps, size_hw, codec=codec)
        except Exception:
            if backend == "native":
                raise
    return VideoWriter(path, fps, size_hw)


class VideoRestorer:
    """Batched sliding-window restorer around a PGTFormer checkpoint."""

    def __init__(self, variables, cfg: PGTFormerConfig = RELEASE_PGTFORMER,
                 w: float = 1.0, batch_windows: int = 8,
                 dtype=jnp.bfloat16, io_backend: str = "auto",
                 use_pallas: Optional[bool] = None, mesh=None,
                 inflight: int = 3):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — windows
        are sharded over it for multi-chip serving (batch_windows must be a
        multiple of the axis size).
        `inflight`: device chunks kept in flight before the oldest is read
        back — deeper pipelining hides readback latency (important on
        high-latency host<->device links) at `inflight` chunks of HBM."""
        if use_pallas is None:
            # fused kernels on TPU; XLA path elsewhere (pallas interpret on
            # CPU would be pathologically slow)
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

        shard_windows = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert B % mesh.shape["data"] == 0, (
                "batch_windows must divide over the data axis")
            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            shard_windows = lambda a: jax.lax.with_sharding_constraint(a, data)
            if not any(isinstance(l, jax.ShapeDtypeStruct)
                       for l in jax.tree.leaves(variables)):
                self.variables = jax.device_put(variables, rep)

        def encode_frames(variables, frames_u8):
            """[F, H, W, 3]u8 -> per-frame feature pytree (pos, trunk, skips)."""
            x = frames_u8.astype(jnp.float32) / 255.0
            return self.model.apply(variables, x,
                                    method="encode_frames")

        def step(variables, tail_ff, new_u8):
            """tail per-frame features (last 2r frames) + new [B, H, W, 3]u8
            -> (restored middles [B, H, W, 3]u8, new feature tail)."""
            ff_new = encode_frames(variables, new_u8)
            ff = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                              tail_ff, ff_new)
            idx = jnp.asarray(win_idx)
            windows = jax.tree.map(lambda a: a[idx], ff)   # each [B, T, ...]
            if shard_windows is not None:
                windows = jax.tree.map(shard_windows, windows)
            pos, trunk, skips = windows
            out, _, _ = self.model.apply(variables, pos, trunk, skips,
                                         w=self.w, middle_only=True,
                                         method="restore_windows")
            out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
            out_u8 = jnp.round(out * 255.0).astype(jnp.uint8)
            tail = jax.tree.map(lambda a: a[-2 * r:] if r else a[:0], ff)
            return out_u8, tail

        if mesh is not None:
            self._step = jax.jit(step, out_shardings=(rep, rep))
        else:
            self._step = jax.jit(step)
        self._encode = jax.jit(encode_frames)
        self.inflight = max(1, inflight)
        self._tail = None
        self._first_chunk_s = None
        self._prime_s = 0.0

    def reset(self):
        self._tail = None
        self._first_chunk_s = None
        self._prime_s = 0.0

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
        (reference inference.py:41-45) and cache its per-frame features."""
        t0 = time.perf_counter()
        t = np.repeat(first_frame[None], 2 * self.radius, axis=0)
        self._tail = self._encode(self.variables, jnp.asarray(t))
        np.asarray(jax.tree.leaves(self._tail)[0].reshape(-1)[:1])  # sync
        self._prime_s = time.perf_counter() - t0  # compile-dominated

    def restore_video(self, input_path: str, output_path: str,
                      progress: bool = False,
                      frame_callback=None, codec: str = "auto") -> dict:
        """Restore a video file; returns timing/throughput stats including a
        per-phase breakdown (decode / dispatch / readback / encode).
        `frame_callback(index, rgb_u8)` is invoked per restored frame.
        `codec`: 'auto'/'libx265'/'libx264'/'mpeg4' (reference encodes
        libx265 CRF18 hvc1 — inference.py:30-35)."""
        import queue
        import threading
        from pgtformer_tpu.utils.profiling import StageTimer
        timer = StageTimer()
        reader = _open_reader(input_path, self.io_backend)
        B = self.batch
        r = self.radius
        n_frames = 0
        t0 = time.perf_counter()
        pending: List = []  # (device_out, n_valid)
        self.reset()

        # encode runs in a writer thread so the (CPU-bound) video encoder
        # overlaps device compute and readback instead of serializing after
        # them (the reference's pipe write blocks its loop the same way —
        # inference.py:65)
        wq: "queue.Queue" = queue.Queue(maxsize=4)
        werr: List[BaseException] = []
        encode_s = [0.0]

        def writer_main():
            writer = None
            try:
                while True:
                    frames = wq.get()
                    if frames is None:
                        break
                    te = time.perf_counter()
                    for f in frames:
                        if writer is None:
                            writer = _open_writer(output_path, reader.fps,
                                                  f.shape[:2],
                                                  self.io_backend, codec)
                        writer.write(f)
                    encode_s[0] += time.perf_counter() - te
            except BaseException as e:  # surfaced after join
                werr.append(e)
            finally:
                if writer is not None:
                    writer.close()

        wthread = threading.Thread(target=writer_main, daemon=True)
        wthread.start()

        # readback runs in a 2-worker pool: device->host transfers of chunk
        # k overlap the dispatch/decode of chunk k+1 AND each other (on
        # high-latency tunnels a single in-order np.asarray stream leaves
        # the link idle between RPCs); `drain` only joins the future, so
        # the main loop blocks on readback no earlier than needed
        from concurrent.futures import ThreadPoolExecutor
        rb_pool = ThreadPoolExecutor(max_workers=2)

        def fetch(dev_out):
            t0f = time.perf_counter()
            frames = np.asarray(dev_out)
            return frames, time.perf_counter() - t0f

        def submit(dev_out, n_valid):
            return rb_pool.submit(fetch, dev_out), n_valid

        def drain(entry):
            nonlocal n_frames
            fut, n_valid = entry
            with timer.stage("readback"):    # wait for device->host fetch
                frames, _ = fut.result()
            valid = frames[:n_valid]
            wq.put(valid)
            if frame_callback is not None:
                for f in valid:
                    frame_callback(n_frames, f)
                    n_frames += 1
            else:
                n_frames += len(valid)

        # Alignment: prime() consumes frame 0 into the device tail
        # ([f0]*2r); after that a chunk of B new frames yields exactly B
        # valid restored centers.  At stream end the remaining q frames owe
        # q + r more outputs, produced from last-frame-padded chunks
        # (matches the reference's first/last duplication padding,
        # inference.py:41-74).
        chunk: List[np.ndarray] = []
        last_frame = None

        def flush(n_valid):
            # first chunk's dispatch is compile-dominated; keep it separate
            name = ("dispatch" if self._first_chunk_s is not None
                    else "compile")
            with timer.stage(name):          # host->device upload + enqueue
                out = self.restore_chunk(np.stack(chunk))
            pending.append(submit(out, n_valid))
            if len(pending) > self.inflight:
                drain(pending.pop(0))

        reader_it = iter(reader)
        while True:
            with timer.stage("decode"):
                frame = next(reader_it, None)
            if frame is None:
                break
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
            wq.put(None)
            wthread.join()
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
        rb_pool.shutdown(wait=True)
        reader.close()
        wq.put(None)
        wthread.join()
        if werr:
            raise werr[0]
        timer.totals["encode(threaded)"] = encode_s[0]
        timer.counts["encode(threaded)"] = 1
        dt = time.perf_counter() - t0
        startup = (self._first_chunk_s or 0.0) + self._prime_s
        steady = dt - startup if startup else dt
        steady_frames = max(n_frames - B, 0)
        return {"frames": n_frames, "seconds": dt,
                "fps": n_frames / dt if dt > 0 else 0.0,
                "compile_seconds": startup,
                "steady_fps": steady_frames / steady if steady > 0 else 0.0,
                "phases": timer.summary()}
