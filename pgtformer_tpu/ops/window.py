"""Shifted-window spatio-temporal attention geometry.

TPU-first re-design of the reference's window machinery
(reference modules/rstt_layers.py:55-114 window_partition/reverse/get_window_size,
:549-568 mask construction, :163-184 relative-position index):

  * All geometry (masks, relative-position indices) is computed in **NumPy at
    trace time** and baked into the program as constants — the reference
    builds the SW-MSA mask on-device with a 9-slice python loop every forward
    call; under XLA there is no reason for any of that to touch the device.
  * Window partition/reverse are pure reshape/transpose on channels-last
    `[B, T, H, W, C]` tensors, which XLA lowers to (mostly free) layout ops.
  * Shapes are static; padding needs are resolved in Python.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp


def effective_window_shift(hw: Tuple[int, int],
                           window: Tuple[int, int],
                           shift: Tuple[int, int]) -> tuple:
    """Clamp window/shift when the input is smaller than the window
    (semantics of reference rstt_layers.py:90-114 `get_window_size`)."""
    win = list(window)
    sh = list(shift)
    for i, s in enumerate(hw):
        if s <= window[i]:
            win[i] = s
            sh[i] = 0
    return tuple(win), tuple(sh)


def window_partition(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B*nW, T*Wh*Ww, C]  (token order: t-major then h, w —
    matches reference window_partition + view at rstt_layers.py:55-70,316)."""
    B, T, H, W, C = x.shape
    wh, ww = window
    x = x.reshape(B, T, H // wh, wh, W // ww, ww, C)
    # -> [B, nH, nW, T, wh, ww, C]
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)
    return x.reshape(B * (H // wh) * (W // ww), T * wh * ww, C)


def window_reverse(windows: jnp.ndarray, window: Tuple[int, int],
                   B: int, T: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    wh, ww = window
    C = windows.shape[-1]
    x = windows.reshape(B, H // wh, W // ww, T, wh, ww, C)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)
    return x.reshape(B, T, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index(num_frames_q: int, num_frames_kv: int,
                            window: Tuple[int, int]) -> np.ndarray:
    """3D relative-position index table lookup indices.

    Returns int32 [D1*Wh*Ww, D2*Wh*Ww] indices into a bias table of size
    (2*D1-1)*(2*Wh-1)*(2*Ww-1).  Semantics of reference
    rstt_layers.py:168-184 (including the kv frame-stride rule at :169).
    """
    wh, ww = window
    d_q = np.arange(num_frames_q)
    stride = int((num_frames_q + 1) // num_frames_kv)
    d_kv = np.arange(0, num_frames_q, stride)
    h = np.arange(wh)
    w = np.arange(ww)

    def grid(ds):
        dd, hh, ww_ = np.meshgrid(ds, h, w, indexing="ij")
        return np.stack([dd.ravel(), hh.ravel(), ww_.ravel()])  # [3, N]

    cq = grid(d_q)       # [3, D1*Wh*Ww]
    ckv = grid(d_kv)     # [3, D2*Wh*Ww]
    rel = cq[:, :, None] - ckv[:, None, :]            # [3, N1, N2]
    rel = rel.transpose(1, 2, 0).astype(np.int64)     # [N1, N2, 3]
    rel[:, :, 0] += num_frames_q - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(num_frames: int, Hp: int, Wp: int,
                        window: Tuple[int, int],
                        shift: Tuple[int, int]) -> np.ndarray:
    """Additive SW-MSA mask, computed host-side.

    Returns float32 [nW, T*Wh*Ww, T*Wh*Ww] with 0 / -100 entries, equal to
    the reference's on-device construction (rstt_layers.py:549-568).
    """
    wh, ww = window
    img = np.zeros((Hp, Wp), np.float32)
    h_slices = (slice(0, -wh), slice(-wh, -shift[0] or None), slice(-shift[0] or Hp, None))
    w_slices = (slice(0, -ww), slice(-ww, -shift[1] or None), slice(-shift[1] or Wp, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img[hs, ws] = cnt
            cnt += 1
    # partition: [nH, wh, nW, ww] -> [nH*nW, wh*ww]
    m = img.reshape(Hp // wh, wh, Wp // ww, ww).transpose(0, 2, 1, 3).reshape(-1, wh * ww)
    # tokens are t-major: tile spatial labels across frames
    m = np.tile(m, (1, num_frames))  # [nW, T*wh*ww]
    diff = m[:, None, :] - m[:, :, None]  # [nW, N, N]  (query index on axis 1)
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))
