"""Interpreter-mode parity for the fused GN+SiLU+conv decoder-tail kernels
(ops/pallas_conv.py) vs the stock XLA modules they replace."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.nn.blocks import ResnetBlock, Upsample, group_norm
from pgtformer_tpu.ops.pallas_conv import (
    channel_stats, gn_affine_from_stats, gn_silu_conv3x3,
    subpixel_up_conv3x3, fused_decoder_tail)

pytestmark = pytest.mark.quick


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(scale=scale, size=shape), jnp.float32)


def test_gn_affine_matches_groupnorm():
    rng = np.random.default_rng(0)
    N, H, W, C = 2, 8, 16, 64
    x = _rand(rng, (N, H, W, C))
    gamma = _rand(rng, (C,))
    beta = _rand(rng, (C,))
    a, b = gn_affine_from_stats(channel_stats(x), gamma, beta, H * W)
    got = x * a[:, None, None] + b[:, None, None]

    gn = group_norm(jnp.float32)
    want = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gn_silu_conv_parity_plain_and_shortcut():
    rng = np.random.default_rng(1)
    N, H, W, C, Co = 2, 16, 32, 64, 32
    x = _rand(rng, (N, H, W, C), 0.5)
    gamma = 1.0 + 0.1 * _rand(rng, (C,))
    beta = 0.1 * _rand(rng, (C,))
    k = _rand(rng, (3, 3, C, Co), 0.05)
    bias = _rand(rng, (Co,), 0.1)
    a, b = gn_affine_from_stats(channel_stats(x), gamma, beta, H * W)

    def ref(extra=0.0):
        h = x * a[:, None, None] + b[:, None, None]
        h = jax.nn.silu(h).astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(h.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        o = jax.lax.conv_general_dilated(
            h, k.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return o + bias + extra

    got, st = gn_silu_conv3x3(x, (a, b), k, bias, bh=4, interpret=True)
    want = ref()
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)
    # chained stats match direct stats of the bf16 output
    st_direct = channel_stats(got)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_direct),
                               rtol=1e-4, atol=1e-2)

    # 1x1 shortcut variant
    sk = _rand(rng, (C, Co), 0.05)
    sb = _rand(rng, (Co,), 0.1)
    got2, _ = gn_silu_conv3x3(x, (a, b), k, bias,
                              shortcut=(x, sk, sb), bh=4, interpret=True)
    want2 = ref() + (x.astype(jnp.bfloat16).reshape(-1, C) @
                     sk.astype(jnp.bfloat16)).reshape(N, H, W, Co) + sb
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want2, np.float32),
                               atol=3e-2, rtol=3e-2)

    # identity-residual variant
    res = _rand(rng, (N, H, W, Co), 0.5)
    got3, _ = gn_silu_conv3x3(x, (a, b), k, bias, residual=res,
                              bh=4, interpret=True)
    want3 = ref() + np.asarray(res.astype(jnp.bfloat16), np.float32)
    np.testing.assert_allclose(np.asarray(got3, np.float32),
                               np.asarray(want3, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_subpixel_up_conv_parity():
    rng = np.random.default_rng(2)
    N, H, W, C = 2, 8, 16, 64
    x = _rand(rng, (N, H, W, C), 0.5)
    up = Upsample(dtype=jnp.float32)
    v = up.init(jax.random.PRNGKey(0), x)
    want = up.apply(v, x)
    k3 = v["params"]["conv"]["kernel"]
    bias = v["params"]["conv"]["bias"]
    got, st = subpixel_up_conv3x3(x, k3, bias, bh=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(st), np.asarray(channel_stats(got)),
                               rtol=1e-4, atol=1e-2)


def test_fused_decoder_tail_parity():
    """The full chain vs the stock module sequence (upsample -> resblock
    128->64 -> resblock 64 -> norm_out+silu) at a small geometry."""
    rng = np.random.default_rng(3)
    N, H, W, C = 2, 8, 8, 128
    h = _rand(rng, (N, H, W, C), 0.5)

    up = Upsample(dtype=jnp.float32)
    rb0 = ResnetBlock(out_channels=64, dtype=jnp.float32)
    rb1 = ResnetBlock(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    v_up = up.init(key, h)
    x_up = up.apply(v_up, h)
    v_b0 = rb0.init(key, x_up)
    x_b0 = rb0.apply(v_b0, x_up)
    v_b1 = rb1.init(key, x_b0)
    x_b1 = rb1.apply(v_b1, x_b0)
    gn = group_norm(jnp.float32)
    v_gn = gn.init(key, x_b1)
    want = jax.nn.silu(gn.apply(v_gn, x_b1))

    got = fused_decoder_tail(h, v_up["params"], v_b0["params"],
                             v_b1["params"], v_gn["params"],
                             interpret=True)
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert diff.max() < 5e-2, diff.max()
    assert diff.mean() < 5e-3, diff.mean()
