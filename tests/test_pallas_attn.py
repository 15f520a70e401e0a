"""Fused Pallas SW-block kernel vs the XLA path (interpreter mode on CPU;
the same kernel runs compiled on TPU — see bench notes)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.nn.blocks import SWTransformerBlock
from pgtformer_tpu.ops.window import (
    window_partition, window_reverse, shifted_window_mask,
    relative_position_index)
from pgtformer_tpu.ops.pallas_attn import fused_sw_block_tokens


@pytest.mark.parametrize("C,heads,shift", [
    (256, 8, (0, 0)),   # hd=32, unshifted
    (256, 8, (2, 2)),   # hd=32, shifted+masked
    (512, 8, (2, 2)),   # hd=64 -> lane-padded path
])
def test_fused_block_matches_xla(C, heads, shift):
    B, T, H, W = 2, 3, 16, 16
    win = (4, 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32))
    blk = SWTransformerBlock(dim=C, num_heads=heads, num_frames=T,
                             window_size=win, shift_size=shift,
                             mlp_ratio=1.0)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(blk.apply(v, x))

    N = T * win[0] * win[1]
    idx = relative_position_index(T, T, win)
    table = np.asarray(v["params"]["attn1"]["relative_position_bias_table"])
    bias = jnp.asarray(table[idx.reshape(-1)].reshape(N, N, heads)
                       .transpose(2, 0, 1))
    nW = (H // win[0]) * (W // win[1])
    shifted = any(s > 0 for s in shift)
    mask = shifted_window_mask(T, H, W, win, shift) if shifted else None

    h = jnp.roll(x, (-shift[0], -shift[1]), axis=(2, 3)) if shifted else x
    tok = window_partition(h, win)
    out_tok = fused_sw_block_tokens(tok, v["params"], bias, mask, heads, nW,
                                    interpret=True)
    out = window_reverse(out_tok.astype(x.dtype), win, B, T, H, W)
    if shifted:
        out = jnp.roll(out, (shift[0], shift[1]), axis=(2, 3))

    d = np.abs(np.asarray(out) - ref)
    # kernel computes in bf16; tolerance is bf16-scale
    assert d.max() < 0.08, d.max()
    assert d.mean() < 0.01, d.mean()


def test_encoder_layer_pallas_flag_cpu_interpret(monkeypatch):
    """EncoderLayer(use_pallas=True) == EncoderLayer(use_pallas=False)
    via the interpreter (patches the kernel entry to interpret mode)."""
    import pgtformer_tpu.ops.pallas_attn as pa
    from pgtformer_tpu.nn.blocks import EncoderLayer

    orig = pa.fused_sw_block_tokens
    orig5d = pa.fused_sw_block_5d

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    def interp5d(*args, **kw):
        kw["interpret"] = True
        return orig5d(*args, **kw)

    monkeypatch.setattr(pa, "fused_sw_block_tokens", interp)
    monkeypatch.setattr(pa, "fused_sw_block_5d", interp5d)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16, 256)).astype(np.float32))
    ref_layer = EncoderLayer(dim=256, depth=2, num_heads=8, num_frames=3,
                             window_size=(4, 4), mlp_ratio=1.0)
    v = ref_layer.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(ref_layer.apply(v, x))

    fused_layer = EncoderLayer(dim=256, depth=2, num_heads=8, num_frames=3,
                               window_size=(4, 4), mlp_ratio=1.0,
                               use_pallas=True)
    out = np.asarray(fused_layer.apply(v, x))
    d = np.abs(out - ref)
    assert d.max() < 0.1 and d.mean() < 0.01


def test_fused_block_grad_matches_xla(monkeypatch):
    """Training through the fused kernel: d loss / d {x, params} from the
    custom VJP equals the plain XLA path's gradients (the VJP rematerializes
    through sw_block_tokens_xla; this pins that ref to the blocks.py math)."""
    import pgtformer_tpu.ops.pallas_attn as pa
    from pgtformer_tpu.nn.blocks import EncoderLayer

    orig = pa.fused_sw_block_tokens
    orig5d = pa.fused_sw_block_5d

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    def interp5d(*args, **kw):
        kw["interpret"] = True
        return orig5d(*args, **kw)

    monkeypatch.setattr(pa, "fused_sw_block_tokens", interp)
    monkeypatch.setattr(pa, "fused_sw_block_5d", interp5d)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 256)).astype(np.float32))
    # depth=1: fwd-value differences (bf16 kernel) can't propagate into the
    # stored-residual bwd, so grads must match the XLA path's exactly
    kw = dict(dim=256, depth=1, num_heads=8, num_frames=3,
              window_size=(4, 4), mlp_ratio=1.0)
    ref_layer = EncoderLayer(**kw)
    fused_layer = EncoderLayer(**kw, use_pallas=True)
    v = ref_layer.init(jax.random.PRNGKey(0), x)

    def loss(layer):
        def f(params, xx):
            out = layer.apply({"params": params}, xx)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                         .reshape(out.shape) * 0.01))
        return f

    g_ref = jax.grad(loss(ref_layer), argnums=(0, 1))(v["params"], x)
    g_fused = jax.grad(loss(fused_layer), argnums=(0, 1))(v["params"], x)

    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


def test_dense_mha_grad_matches_xla():
    """dense_mha custom VJP == stock XLA attention gradients."""
    from pgtformer_tpu.ops.flash_attn import dense_mha
    B, H, N, D = 1, 2, 32, 16
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    scale = D ** -0.5
    w = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))

    def ref_loss(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32)
        return jnp.sum(o * w)

    def fused_loss(q, k, v):
        return jnp.sum(dense_mha(q, k, v, scale=scale, block_q=16,
                                 interpret=True) * w)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_fus = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_dense_mha_matches_xla_interpret():
    """Dense-transformer attention kernel (ops/flash_attn.py) vs plain XLA
    attention, interpreter mode on CPU."""
    from pgtformer_tpu.ops.flash_attn import dense_mha
    B, H, N, D = 2, 4, 64, 32
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    scale = D ** -0.5

    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)

    out = dense_mha(q, k, v, scale=scale, block_q=32, interpret=True)
    # kernel computes in bf16 matmuls with fp32 softmax
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    # heads-minor layout (bnhd): same math, no head transposes in HBM
    t = lambda a: a.transpose(0, 2, 1, 3)   # [B,H,N,D] -> [B,N,H,D]
    out2 = dense_mha(t(q), t(k), t(v), scale=scale, block_q=32,
                     layout="bnhd", interpret=True)
    np.testing.assert_allclose(np.asarray(t(out2)), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    # bnhd grad parity (custom VJP through the transposed reference)
    w = jnp.asarray(np.random.default_rng(9).normal(
        size=(B, N, H, D)).astype(np.float32))
    def loss(q, k, v):
        return jnp.sum(dense_mha(q, k, v, scale=scale, block_q=32,
                                 layout="bnhd", interpret=True) * w)
    def ref_loss(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                       preferred_element_type=jnp.float32)
        return jnp.sum(o * w)
    g_f = jax.grad(loss, argnums=(0, 1, 2))(t(q), t(k), t(v))
    g_r = jax.grad(ref_loss, argnums=(0, 1, 2))(t(q), t(k), t(v))
    for a, b in zip(g_r, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_vq_nearest_code_matches_xla_interpret():
    """Fused VQ nearest-code kernel == XLA argmin over full distances."""
    from pgtformer_tpu.ops.pallas_vq import nearest_code_pallas
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2048, 64)).astype(np.float32))
    codes = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))

    d = (jnp.sum(codes * codes, -1) + jnp.sum(x * x, -1, keepdims=True)
         - 2.0 * (x @ codes.T))
    ref = np.asarray(jnp.argmin(d, axis=-1))

    out = np.asarray(nearest_code_pallas(x, codes, interpret=True))
    agreement = (out == ref).mean()
    assert agreement > 0.999, agreement  # near-tie rounding only

    # odd geometry takes the XLA fallback and must be exact
    out2 = np.asarray(nearest_code_pallas(x[:100], codes, interpret=True))
    np.testing.assert_array_equal(out2, ref[:100])


@pytest.mark.parametrize("C,heads,shift", [
    (256, 8, (0, 0)),   # hd=32, unshifted single-stripe path
    (256, 8, (2, 2)),   # hd=32, shifted: two mod-wrapped half-stripes
    (512, 8, (2, 2)),   # hd=64 -> lane-padded path
])
def test_fused_block_5d_matches_token_kernel(C, heads, shift):
    """The 5D-direct stripe kernel must be BIT-identical to the token
    kernel (same _block_math, only the partition moves in-kernel)."""
    from pgtformer_tpu.ops.pallas_attn import (_pallas_sw_block,
                                               _pallas_sw_block_5d)
    B, T, H, W = 2, 3, 16, 16
    win = (4, 4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C))
                    .astype(np.float32)).astype(jnp.bfloat16)
    blk = SWTransformerBlock(dim=C, num_heads=heads, num_frames=T,
                             window_size=win, shift_size=shift,
                             mlp_ratio=1.0)
    v = blk.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
    N = T * win[0] * win[1]
    idx = relative_position_index(T, T, win)
    table = np.asarray(v["params"]["attn1"]["relative_position_bias_table"])
    bias = jnp.asarray(table[idx.reshape(-1)].reshape(N, N, heads)
                       .transpose(2, 0, 1))
    nW = (H // win[0]) * (W // win[1])
    shifted = any(s > 0 for s in shift)
    mask = shifted_window_mask(T, H, W, win, shift) if shifted else None

    h = jnp.roll(x, (-shift[0], -shift[1]), axis=(2, 3)) if shifted else x
    tok = window_partition(h, win)
    tok = _pallas_sw_block(tok, v["params"], bias, mask, heads, nW,
                           wblk=4, interpret=True)
    y_tok = window_reverse(tok.astype(x.dtype), win, B, T, H, W)
    if shifted:
        y_tok = jnp.roll(y_tok, (shift[0], shift[1]), axis=(2, 3))

    y_5d = _pallas_sw_block_5d(x, v["params"], bias, mask, heads, win,
                               shift, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_5d, np.float32),
                                  np.asarray(y_tok, np.float32))

    # every stripe height divides the same answer (1 = single window-row,
    # 2 = multi-row with 4 mod-wrapped half-stripes when shifted, 4 = the
    # whole image in one program)
    for rps in (1, 2, 4):
        y_r = _pallas_sw_block_5d(x, v["params"], bias, mask, heads, win,
                                  shift, interpret=True,
                                  rows_per_stripe=rps)
        np.testing.assert_array_equal(np.asarray(y_r, np.float32),
                                      np.asarray(y_tok, np.float32))


def test_fused_block_5d_grad_matches_xla():
    """fused_sw_block_5d custom VJP == XLA-path grads (small geometry)."""
    import pgtformer_tpu.ops.pallas_attn as pa
    C, heads, T, win = 64, 4, 3, (4, 4)
    B, H, W = 1, 8, 8
    shift = (2, 2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32))
    blk = SWTransformerBlock(dim=C, num_heads=heads, num_frames=T,
                             window_size=win, shift_size=shift,
                             mlp_ratio=1.0)
    v = blk.init(jax.random.PRNGKey(0), x)
    N = T * win[0] * win[1]
    idx = relative_position_index(T, T, win)
    table = np.asarray(v["params"]["attn1"]["relative_position_bias_table"])
    bias = jnp.asarray(table[idx.reshape(-1)].reshape(N, N, heads)
                       .transpose(2, 0, 1))
    mask = shifted_window_mask(T, H, W, win, shift)

    def loss_fused(x, p, rb):
        y = pa.fused_sw_block_5d(x.astype(jnp.bfloat16), p, rb, mask,
                                 heads, win, shift, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_xla(x, p, rb):
        y = pa.sw_block_5d_xla(x.astype(jnp.bfloat16), p, rb, mask,
                               heads, win, shift)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 2))(x, v["params"], bias)
    g_x = jax.grad(loss_xla, argnums=(0, 2))(x, v["params"], bias)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        # fwd values differ at bf16 scale; custom-VJP grads use the XLA
        # rematerialization so cotangents match closely
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-1, rtol=2e-2)


@pytest.mark.parametrize("C,heads", [
    (256, 8),           # hd=32
    (512, 8),           # hd=64 -> lane-padded path
])
def test_fused_block_pair_matches_two_kernels(C, heads):
    """The [no-shift, shift] pair kernel must be BIT-identical to two
    sequential 5D kernels (block-0's carried-scratch value is the same
    bf16 the two-kernel path round-trips through HBM)."""
    from pgtformer_tpu.ops.pallas_attn import (_pallas_sw_block_5d,
                                               _pallas_sw_block_pair_5d)
    B, T, H, W = 2, 3, 16, 16
    win = (4, 4)
    half = (2, 2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C))
                    .astype(np.float32)).astype(jnp.bfloat16)

    vs, biases = [], []
    for seed in (0, 1):
        blk = SWTransformerBlock(dim=C, num_heads=heads, num_frames=T,
                                 window_size=win,
                                 shift_size=(0, 0) if seed == 0 else half,
                                 mlp_ratio=1.0)
        v = blk.init(jax.random.PRNGKey(seed), x.astype(jnp.float32))
        N = T * win[0] * win[1]
        idx = relative_position_index(T, T, win)
        table = np.asarray(
            v["params"]["attn1"]["relative_position_bias_table"])
        biases.append(jnp.asarray(
            table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)))
        vs.append(v["params"])
    mask1 = shifted_window_mask(T, H, W, win, half)

    y0 = _pallas_sw_block_5d(x, vs[0], biases[0], None, heads, win, (0, 0),
                             interpret=True)
    y_ref = _pallas_sw_block_5d(y0, vs[1], biases[1], mask1, heads, win,
                                half, interpret=True)

    for rps in (1, 2, 4):
        y_pair = _pallas_sw_block_pair_5d(x, vs[0], vs[1], biases[0],
                                          biases[1], mask1, heads, win,
                                          interpret=True,
                                          rows_per_stripe=rps)
        np.testing.assert_array_equal(np.asarray(y_pair, np.float32),
                                      np.asarray(y_ref, np.float32))


def test_fused_block_pair_grad_matches_xla():
    """Pair-kernel custom VJP == sequential XLA two-block grads."""
    import pgtformer_tpu.ops.pallas_attn as pa
    C, heads, T, win = 64, 4, 3, (4, 4)
    B, H, W = 1, 8, 8
    half = (2, 2)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32))
    vs, biases = [], []
    for seed in (0, 1):
        blk = SWTransformerBlock(dim=C, num_heads=heads, num_frames=T,
                                 window_size=win,
                                 shift_size=(0, 0) if seed == 0 else half,
                                 mlp_ratio=1.0)
        v = blk.init(jax.random.PRNGKey(seed), x)
        N = T * win[0] * win[1]
        idx = relative_position_index(T, T, win)
        table = np.asarray(
            v["params"]["attn1"]["relative_position_bias_table"])
        biases.append(jnp.asarray(
            table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)))
        vs.append(v["params"])
    mask1 = shifted_window_mask(T, H, W, win, half)

    # the pair's custom VJP rematerializes through the two-block XLA chain;
    # feed the SAME cotangent into (a) the pair function's vjp and (b) a
    # hand-built vjp of that exact XLA chain — identical jaxprs, so the
    # wiring (mask, shift, param routing) must match to float tolerance
    xb = x.astype(jnp.bfloat16)

    def pair_fn(x, p0, p1):
        return pa.fused_sw_block_pair_5d(x, p0, p1, biases[0], biases[1],
                                         mask1, heads, win, interpret=True)

    def xla_chain(x, p0, p1):
        h = pa.sw_block_5d_xla(x, p0, biases[0], None, heads, win, (0, 0))
        return pa.sw_block_5d_xla(h, p1, biases[1], mask1, heads, win, half)

    y, vjp_pair = jax.vjp(pair_fn, xb, vs[0], vs[1])
    g = (2.0 * y.astype(jnp.float32)).astype(y.dtype)
    gp = vjp_pair(g)
    _, vjp_ref = jax.vjp(xla_chain, xb, vs[0], vs[1])
    gr = vjp_ref(g)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-4, rtol=1e-4)
