"""Incremental (cached per-frame trunk) inference == naive sliding windows.

The serving pipeline computes the per-frame trunk (BiSeNet prior + the
encoder's attention-free levels) once per unique frame and decodes only the
kept middle frame (reference inference.py:37-74 instead pays a full 3-frame
forward per output frame).  These tests pin that both optimizations are
exact restructurings, not approximations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train import SMALL_PGT
from pgtformer_tpu.models.pgtformer import PGTFormer


@pytest.fixture(scope="module")
def model_and_vars():
    mod = PGTFormer(SMALL_PGT)
    rng = np.random.default_rng(7)
    x0 = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: mod.init({"params": jax.random.PRNGKey(0)}, x0, w=1.0))
    variables = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(scale=0.05, size=s.shape)
                              .astype(s.dtype))
        if np.issubdtype(s.dtype, np.floating)
        else jnp.zeros(s.shape, s.dtype), shapes)
    return mod, variables


@pytest.mark.parametrize("w", [1.0, 0.0])
def test_middle_only_matches_full(model_and_vars, w):
    mod, variables = model_and_vars
    rng = np.random.default_rng(11)
    B, T = 2, 3
    x = jnp.asarray(rng.uniform(0, 1, (B, T, 32, 32, 3)).astype(np.float32))

    out_full, logits_f, lq_f = mod.apply(variables, x, w=w)
    out_mid, logits_m, lq_m = mod.apply(variables, x, w=w, middle_only=True)

    mid_full = np.asarray(out_full).reshape(B, T, 32, 32, 3)[:, T // 2]
    assert out_mid.shape == (B, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out_mid), mid_full,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lq_m), np.asarray(lq_f),
                               atol=1e-5, rtol=1e-5)


def test_cached_trunk_windows_match_naive(model_and_vars):
    """encode_frames once per unique frame + restore_windows over gathered
    windows == naive full forward per window."""
    mod, variables = model_and_vars
    rng = np.random.default_rng(13)
    F, T = 6, 3
    frames = jnp.asarray(rng.uniform(0, 1, (F, 32, 32, 3)).astype(np.float32))

    # cached path: per-frame features computed once
    ff = mod.apply(variables, frames, method=PGTFormer.encode_frames)
    nwin = F - T + 1
    win_idx = np.stack([np.arange(i, i + T) for i in range(nwin)])
    windows = jax.tree.map(lambda a: a[win_idx], ff)
    out_cached, _, _ = mod.apply(variables, *windows, w=1.0,
                                 middle_only=True,
                                 method=PGTFormer.restore_windows)

    # naive path: a full forward per sliding window
    for i in range(nwin):
        x = frames[i:i + T][None]
        out, _, _ = mod.apply(variables, x, w=1.0)
        mid = np.asarray(out).reshape(T, 32, 32, 3)[T // 2]
        np.testing.assert_allclose(np.asarray(out_cached[i]), mid,
                                   atol=1e-5, rtol=1e-5)


def test_encode_frames_is_per_frame(model_and_vars):
    """Per-frame features must not depend on neighboring frames (otherwise
    cross-window caching would be unsound)."""
    mod, variables = model_and_vars
    rng = np.random.default_rng(17)
    frames = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    ff_all = mod.apply(variables, frames, method=PGTFormer.encode_frames)
    ff_one = mod.apply(variables, frames[1:2],
                       method=PGTFormer.encode_frames)
    for a, b in zip(jax.tree.leaves(ff_all), jax.tree.leaves(ff_one)):
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[0]),
                                   atol=1e-6, rtol=1e-6)
