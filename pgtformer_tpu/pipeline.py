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


def _rgb_to_yuv420(out):
    """Float RGB [B, H, W, 3] in [0,1] -> BT.601 limited-range YUV420P
    planes (y [B, H, W], u/v [B, H/2, W/2], uint8).

    Runs on-device so the host skips libswscale AND the device->host
    transfer drops from 3 to 1.5 bytes/pixel — on high-latency links the
    readback is the product-path ceiling (BASELINE.md round-3 phase
    tables).  Chroma is the mean of each 2x2 block (MPEG-style siting)."""
    r_, g_, b_ = out[..., 0], out[..., 1], out[..., 2]
    y = 16.0 + 65.481 * r_ + 128.553 * g_ + 24.966 * b_
    u = 128.0 - 37.797 * r_ - 74.203 * g_ + 112.0 * b_
    v = 128.0 + 112.0 * r_ - 93.786 * g_ - 18.214 * b_
    n, h, w = u.shape
    u = u.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    v = v.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    q = lambda t: jnp.clip(jnp.round(t), 0.0, 255.0).astype(jnp.uint8)
    return q(y), q(u), q(v)


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
                 inflight: int = 3, readback: str = "rgb"):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — windows
        are sharded over it for multi-chip serving (batch_windows must be a
        multiple of the axis size).
        `inflight`: device chunks kept in flight before the oldest is read
        back — deeper pipelining hides readback latency (important on
        high-latency host<->device links) at `inflight` chunks of HBM.
        `readback`: 'rgb' (uint8 [B,H,W,3] chunks) or 'yuv420' (the device
        converts to BT.601 YUV420P planes: half the device->host bytes and
        no host swscale; needs the native writer and even H/W; RGB frame
        callbacks / frame dumps are unavailable in this mode)."""
        assert readback in ("rgb", "yuv420")
        self.readback = readback
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

        def encode_frames(variables, frames_u8):
            """[F, H, W, 3]u8 -> per-frame feature pytree (pos, trunk, skips)."""
            x = frames_u8.astype(jnp.float32) / 255.0
            return self.model.apply(variables, x,
                                    method="encode_frames")

        def restore(variables, windows):
            pos, trunk, skips = windows
            out, _, _ = self.model.apply(variables, pos, trunk, skips,
                                         w=self.w, middle_only=True,
                                         method="restore_windows")
            out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
            if self.readback == "yuv420":
                return _rgb_to_yuv420(out)
            return jnp.round(out * 255.0).astype(jnp.uint8)

        def step(variables, tail_ff, new_u8):
            """tail per-frame features (last 2r frames) + new [B, H, W, 3]u8
            -> (restored middles [B, H, W, 3]u8, new feature tail)."""
            ff_new = encode_frames(variables, new_u8)
            ff = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                              tail_ff, ff_new)
            idx = jnp.asarray(win_idx)
            windows = jax.tree.map(lambda a: a[idx], ff)   # each [B, T, ...]
            out_u8 = restore(variables, windows)
            tail = jax.tree.map(lambda a: a[-2 * r:] if r else a[:0], ff)
            return out_u8, tail

        if mesh is not None and mesh.shape["data"] > 1:
            self._step = self._build_sharded_step(
                mesh, encode_frames, restore)
        else:
            self._step = jax.jit(step)
        self._encode = jax.jit(encode_frames)
        self.inflight = max(1, inflight)
        self._tail = None
        self._first_chunk_s = None
        self._prime_s = 0.0

    def _build_sharded_step(self, mesh, encode_frames, restore):
        """Multi-chip serving step: shard_map over the mesh's 'data' axis.

        TPU-native halo-exchange design (vs the reference's NCCL DDP which
        never serves multi-GPU at all): frames are sharded over chips; each
        chip encodes only its local B/n frames; the T-frame sliding windows
        at shard boundaries need the 2r preceding frames, which arrive from
        the ring-left neighbor via `ppermute` — O(2r) frames of ICI traffic
        per step, independent of batch size.  (A plain
        with_sharding_constraint formulation makes GSPMD all-gather ALL
        B+2r frames' features to every chip each step — measured in the
        compiled HLO, see __graft_entry__.py.)  The carried global tail
        (the last 2r frames' features, replicated so chunk boundaries are
        seamless) is rebuilt with one masked psum of the same O(2r) size.
        Per-chip compute is identical to the single-chip graph, so
        aggregate v5e-n throughput is n x the single-chip fps.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        B, T, r = self.batch, self.cfg.vqvae.tf, self.radius
        n = mesh.shape["data"]
        assert B % n == 0, "batch_windows must divide over the data axis"
        Bl = B // n
        assert r >= 1 and B >= 2 * r, "chunk must cover the temporal halo"
        if not any(isinstance(l, jax.ShapeDtypeStruct)
                   for l in jax.tree.leaves(self.variables)):
            self.variables = jax.device_put(
                self.variables, NamedSharding(mesh, P()))
        # halo depth: how many ring-left neighbors hold my 2r prefix frames
        D = -(-2 * r // Bl) if r else 0
        send_cnt = min(2 * r, Bl)
        loc_idx = np.stack([np.arange(i, i + T) for i in range(Bl)])

        def sharded_step(variables, tail_ff, new_u8):
            # new_u8: LOCAL [Bl, H, W, 3]; tail_ff: replicated [2r, ...]
            ff_local = encode_frames(variables, new_u8)
            k = jax.lax.axis_index("data")

            # ring halo: receive the last send_cnt frames of chips k-d
            recvs = {}
            for d in range(1, D + 1):
                perm = [(j, (j + d) % n) for j in range(n)]
                recvs[d] = jax.tree.map(
                    lambda a: jax.lax.ppermute(a[-send_cnt:], "data", perm),
                    ff_local)

            # prefix slot m of chip k holds chunk-frame index k*Bl + m - 2r
            # (negative = previous chunk, served by the carried tail at
            # tail[k*Bl + m])
            slots = []
            for m in range(2 * r):
                o = m - 2 * r
                d_m = -(o // Bl)                 # ring-left distance
                p_sent = o % Bl - (Bl - send_cnt)
                t_idx = jnp.minimum(k * Bl + m, 2 * r - 1)
                from_tail = jax.tree.map(lambda a: a[t_idx], tail_ff)
                from_halo = jax.tree.map(lambda a: a[p_sent], recvs[d_m])
                # chips k < d_m wrap around the ring: their prefix frames
                # predate this chunk and come from the carried tail instead
                slots.append(jax.tree.map(
                    lambda t, h: jnp.where(k >= d_m, h, t),
                    from_tail, from_halo))
            prefix = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *slots)
            ctx = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                               prefix, ff_local)

            idx = jnp.asarray(loc_idx)
            windows = jax.tree.map(lambda a: a[idx], ctx)  # [Bl, T, ...]
            out_u8 = restore(variables, windows)

            # next global tail = frames B-2r..B-1 of this chunk; slot m
            # lives on chip (B-2r+m)//Bl — mask + psum replicates it
            def new_tail(a):
                parts = []
                for m in range(2 * r):
                    q, p = divmod(B - 2 * r + m, Bl)
                    parts.append(jnp.where(k == q, a[p], jnp.zeros_like(a[p])))
                return jax.lax.psum(jnp.stack(parts, 0), "data")
            tail = jax.tree.map(new_tail, ff_local)
            return out_u8, tail

        return jax.jit(shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(), P("data")),
            out_specs=(P("data"), P()),
            check_rep=False))

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
            # include compile in startup time
            np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
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

        yuv = self.readback == "yuv420"
        if yuv and frame_callback is not None:
            raise ValueError("frame_callback needs readback='rgb' "
                             "(yuv420 mode never materializes RGB on host)")

        def writer_main():
            writer = None
            try:
                while True:
                    frames = wq.get()
                    if frames is None:
                        break
                    te = time.perf_counter()
                    if yuv:
                        y, u, v = frames
                        if writer is None:
                            writer = _open_writer(output_path, reader.fps,
                                                  y.shape[1:3], "native",
                                                  codec)
                        for i in range(y.shape[0]):
                            writer.write_yuv420(y[i], u[i], v[i])
                    else:
                        for f in frames:
                            if writer is None:
                                writer = _open_writer(output_path,
                                                      reader.fps, f.shape[:2],
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
            frames = jax.tree.map(np.asarray, dev_out)
            return frames, time.perf_counter() - t0f

        def submit(dev_out, n_valid):
            return rb_pool.submit(fetch, dev_out), n_valid

        def put_to_writer(item):
            # bounded put that re-checks writer health every second: a
            # writer death *after* a one-shot health check would otherwise
            # deadlock this thread on the full 4-slot queue
            while True:
                if werr:
                    raise werr[0]
                try:
                    wq.put(item, timeout=1.0)
                    return
                except queue.Full:
                    continue

        def drain(entry):
            nonlocal n_frames
            fut, n_valid = entry
            with timer.stage("readback"):    # wait for device->host fetch
                frames, _ = fut.result()
            valid = jax.tree.map(lambda a: a[:n_valid], frames)
            put_to_writer(valid)
            if frame_callback is not None:
                for f in valid:
                    frame_callback(n_frames, f)
                    n_frames += 1
            else:
                n_frames += n_valid

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

        def signal_writer_stop():
            # bounded: if the writer is alive it will free a slot; if it
            # died there is nobody left to signal
            while wthread.is_alive():
                try:
                    wq.put(None, timeout=1.0)
                    return
                except queue.Full:
                    if werr:
                        return

        finished = False
        try:
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
                finished = True
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
            finished = True
        finally:
            # every exit (including writer/encoder-error raises) releases
            # the decoder handle, the readback pool and the writer thread —
            # long-lived callers must not leak them
            rb_pool.shutdown(wait=finished, cancel_futures=not finished)
            reader.close()
            signal_writer_stop()
            # success path must wait for the encoder to finalize the file;
            # error paths get a bounded join (the writer is a daemon)
            wthread.join(timeout=None if finished else 60.0)
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
