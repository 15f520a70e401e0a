"""Block-level numeric parity with the PyTorch reference (CPU oracle)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.nn.blocks import (
    ResnetBlock, Upsample, Downsample, EncoderLayer)
from pgtformer_tpu.nn.transformer import TransformerSALayer
from pgtformer_tpu.convert.torch_port import port_torch_state_dict
from tests.conftest import torch_state_dict_to_numpy

ATOL = 2e-5


def _nchw(x5):  # [B,T,H,W,C] -> torch [B,T,C,H,W]
    return np.ascontiguousarray(x5.transpose(0, 1, 4, 2, 3))


def test_resnet_block_parity(reference):
    import torch
    torch.manual_seed(3)
    ref = reference.rstt_layers.TDResnetBlock(
        in_channels=32, out_channels=64, dropout=0.0, temb_channels=0)
    ref.eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x)), None).numpy()

    mod = ResnetBlock(out_channels=64)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(_nchw(out), ref_out, atol=ATOL, rtol=1e-4)


def test_resnet_block_same_channels(reference):
    import torch
    torch.manual_seed(4)
    ref = reference.rstt_layers.TDResnetBlock(
        in_channels=32, out_channels=32, dropout=0.0, temb_channels=0)
    ref.eval()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 4, 4, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x)), None).numpy()
    mod = ResnetBlock()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(_nchw(out), ref_out, atol=ATOL, rtol=1e-4)


def test_downsample_parity(reference):
    import torch
    torch.manual_seed(5)
    ref = reference.tdcrqvae3.Downsample(16, with_conv=True)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 3, 8, 8, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x))).numpy()
    mod = Downsample(with_conv=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(_nchw(out), ref_out, atol=ATOL, rtol=1e-4)


def test_upsample_parity(reference):
    import torch
    torch.manual_seed(6)
    ref = reference.tdcrqvae3.Upsample(16, with_conv=True)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 3, 4, 4, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x))).numpy()
    mod = Upsample(with_conv=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(_nchw(out), ref_out, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("hw", [(8, 8), (12, 8)])
def test_encoder_layer_parity(reference, hw):
    """Depth-2 stack: exercises both the unshifted and shifted (masked) path
    plus the 3D relative position bias."""
    import torch
    torch.manual_seed(7)
    H, W = hw
    ref = reference.rstt_layers.EncoderLayer(
        dim=32, depth=2, num_heads=4, num_frames=3, window_size=(4, 4),
        mlp_ratio=1)
    ref.eval()
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, H, W, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x))).numpy()

    mod = EncoderLayer(dim=32, depth=2, num_heads=4, num_frames=3,
                       window_size=(4, 4), mlp_ratio=1.0)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(_nchw(out), ref_out, atol=5e-5, rtol=1e-4)


def test_transformer_sa_layer_parity(reference):
    import torch
    torch.manual_seed(8)
    ref = reference.codeformer.TransformerSALayer(
        embed_dim=64, nhead=4, dim_mlp=128, dropout=0.0)
    ref.eval()
    rng = np.random.default_rng(8)
    # reference is seq-first [N, B, C]; ours batch-first [B, N, C]
    x = rng.normal(size=(2, 10, 64)).astype(np.float32)
    pos = rng.normal(size=(2, 10, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(1, 0, 2)),
                      query_pos=torch.from_numpy(pos.transpose(1, 0, 2)))
        ref_out = ref_out.numpy().transpose(1, 0, 2)

    mod = TransformerSALayer(embed_dim=64, nhead=4, dim_mlp=128)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         query_pos=jnp.asarray(pos))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(variables, jnp.asarray(x),
                               query_pos=jnp.asarray(pos)))
    np.testing.assert_allclose(out, ref_out, atol=ATOL, rtol=1e-4)
