"""Window geometry: partition/reverse round-trip + parity with the oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from pgtformer_tpu.ops.window import (
    window_partition, window_reverse, relative_position_index,
    shifted_window_mask, effective_window_shift)


pytestmark = pytest.mark.quick


def test_partition_reverse_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 12, 5)).astype(np.float32)
    win = (4, 4)
    w = window_partition(jnp.asarray(x), win)
    assert w.shape == (2 * 2 * 3, 3 * 16, 5)
    back = window_reverse(w, win, 2, 3, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_partition_matches_reference(reference):
    import torch
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 8, 8, 4)).astype(np.float32)
    ref = reference.rstt_layers.window_partition(torch.from_numpy(x), (4, 4))
    ref = ref.reshape(-1, 3 * 16, 4).numpy()
    ours = np.asarray(window_partition(jnp.asarray(x), (4, 4)))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_relative_position_index_matches_reference(reference):
    attn = reference.rstt_layers.WindowAttention3D(
        dim=8, num_frames_q=3, num_frames_kv=3, window_size=(4, 4), num_heads=2)
    ref_idx = attn.relative_position_index.numpy()
    ours = relative_position_index(3, 3, (4, 4))
    np.testing.assert_array_equal(ours, ref_idx)


def test_shifted_window_mask_matches_reference(reference):
    import torch
    layer = reference.rstt_layers.EncoderLayer(
        dim=8, depth=2, num_heads=2, num_frames=3, window_size=(4, 4),
        mlp_ratio=1)
    # re-create the reference's on-device mask with its own code path:
    # run forward with hooks is heavy; instead reproduce via its block code
    D, Hp, Wp = 3, 8, 8
    window_size, shift_size = (4, 4), (2, 2)
    img_mask = torch.zeros((1, D, Hp, Wp, 1))
    h_slices = (slice(0, -4), slice(-4, -2), slice(-2, None))
    w_slices = (slice(0, -4), slice(-4, -2), slice(-2, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, :, h, w, :] = cnt
            cnt += 1
    mw = reference.rstt_layers.window_partition(img_mask, window_size)
    mw = mw.view(-1, D * 16)
    ref = (mw.unsqueeze(1) - mw.unsqueeze(2))
    ref = ref.masked_fill(ref != 0, -100.0).masked_fill(ref == 0, 0.0).numpy()
    ours = shifted_window_mask(D, Hp, Wp, window_size, shift_size)
    np.testing.assert_array_equal(ours, ref)


def test_effective_window_shift_clamps():
    win, sh = effective_window_shift((2, 8), (4, 4), (2, 2))
    assert win == (2, 4) and sh == (0, 2)
