"""Full TDCRQVAE3 autoencoder parity with the reference (small config)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.config import DDConfig, VQVAEConfig
from pgtformer_tpu.models.vae import TDCRQVAE3
from pgtformer_tpu.convert.torch_port import port_torch_state_dict
from tests.conftest import torch_state_dict_to_numpy

# small but structurally complete: 2 levels, attention at the latent level,
# shifted windows (depth 2), GroupNorm-compatible channels
SMALL_DD = dict(
    double_z=False, z_channels=32, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], depths=[2, 2], num_heads=[4, 4],
    window_sizes=[[4, 4], [4, 4]], num_frames=3, num_res_blocks=1,
    attn_resolutions=[16], dropout=0.0)

SMALL_KW = dict(embed_dim=32, n_embed=64, decay=0.99, loss_type="mse",
                latent_loss_weight=0.25, bottleneck_type="rq",
                latent_shape=[16, 16, 32], code_shape=[16, 16, 1],
                shared_codebook=True, restart_unused_codes=True, tf=3)


@pytest.fixture(scope="module")
def vae_pair(reference):
    import torch
    torch.manual_seed(11)
    ref = reference.tdcrqvae3.TDCRQVAE3(ddconfig=dict(SMALL_DD), **SMALL_KW)
    ref.eval()

    cfg = VQVAEConfig.from_dict({**SMALL_KW, "ddconfig": SMALL_DD})
    mod = TDCRQVAE3(cfg)
    x = np.random.default_rng(11).normal(
        size=(1, 3, 32, 32, 3)).astype(np.float32) * 0.3
    variables = mod.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    return ref, mod, variables, x


def _nchw_bt(x5):  # [B,T,H,W,C] -> torch [B*T,C,H,W]
    B, T, H, W, C = x5.shape
    return np.ascontiguousarray(
        x5.reshape(B * T, H, W, C).transpose(0, 3, 1, 2))


def _nchw4(x4):  # [N,H,W,C] -> [N,C,H,W]
    return np.ascontiguousarray(np.asarray(x4).transpose(0, 3, 1, 2))


def test_vae_forward_parity(vae_pair):
    import torch
    ref, mod, variables, x = vae_pair
    with torch.no_grad():
        out_ref, loss_ref, codes_ref = ref(torch.from_numpy(_nchw_bt(x)))
    out, loss, codes = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(_nchw4(out), out_ref.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_vae_encode_multi_res_feats(vae_pair):
    ref, mod, variables, x = vae_pair
    z_e, feats = mod.apply(variables, jnp.asarray(x), True,
                           method=TDCRQVAE3.encode)
    assert z_e.shape == (3, 16, 16, 32)
    assert [f.shape for f in feats] == [(1, 3, 32, 32, 32), (1, 3, 16, 16, 64)]


def test_vae_decode_code_parity(vae_pair):
    import torch
    ref, mod, variables, x = vae_pair
    with torch.no_grad():
        codes_ref = ref.get_codes(torch.from_numpy(_nchw_bt(x)))
        dec_ref = ref.decode_code(codes_ref)
    codes = mod.apply(variables, jnp.asarray(x), method=TDCRQVAE3.get_codes)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    dec = mod.apply(variables, jnp.asarray(codes),
                    method=TDCRQVAE3.decode_code)
    np.testing.assert_allclose(_nchw4(dec), dec_ref.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_vae_compute_loss(vae_pair):
    import torch
    ref, mod, variables, x = vae_pair
    xt = torch.from_numpy(_nchw_bt(x))
    with torch.no_grad():
        out_ref, ql_ref, c_ref = ref(xt)
        ld_ref = ref.compute_loss(out_ref, ql_ref, c_ref, xs=xt)
    out, ql, c = mod.apply(variables, jnp.asarray(x))
    xs = jnp.asarray(_nchw_bt(x).transpose(0, 2, 3, 1))
    ld = mod.apply(variables, out, ql, c, xs,
                   method=TDCRQVAE3.compute_loss)
    np.testing.assert_allclose(float(ld["loss_total"]),
                               float(ld_ref["loss_total"]), atol=1e-5)


def test_vae_get_codesbt_and_flat_parity(vae_pair):
    """Reference get_codesbt (explicit [B,T]) and get_codes (flattened
    [B*T]) analogs (tdcrqvae3_arch.py:786-800)."""
    import torch
    ref, mod, variables, x = vae_pair
    xt_flat = torch.from_numpy(_nchw_bt(x))
    with torch.no_grad():
        # ref.get_codesbt itself crashes as shipped (passes 4D to the 5D
        # encoder — tdcrqvae3_arch.py:797); its working get_codes on the
        # flattened batch is the same math and serves as the oracle
        c_flat = ref.get_codes(xt_flat)
    ours_bt = mod.apply(variables, jnp.asarray(x),
                        method=TDCRQVAE3.get_codesbt)
    np.testing.assert_array_equal(np.asarray(ours_bt), c_flat.numpy())
    x_flat = jnp.asarray(x).reshape(3, 32, 32, 3)
    ours_flat = mod.apply(variables, x_flat,
                          method=TDCRQVAE3.get_codes_flat)
    np.testing.assert_array_equal(np.asarray(ours_flat), c_flat.numpy())
