"""Secondary architecture family parity: RQVAE (2D), Swin3D BasicLayer,
TDRQVAE (latent-swin temporal variant)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.config import DDConfig, VQVAEConfig
from pgtformer_tpu.models.rqvae import RQVAE
from pgtformer_tpu.models.tdrqvae import TDRQVAE
from pgtformer_tpu.nn.swin3d import BasicLayer3D
from pgtformer_tpu.convert.torch_port import port_torch_state_dict
from tests.conftest import torch_state_dict_to_numpy


@pytest.fixture(scope="module")
def reference_swin(reference):
    """Import reference modules/swin.py + tdrqvae with an mmcv stub."""
    if "mmcv" not in sys.modules:
        mmcv = types.ModuleType("mmcv")
        runner = types.ModuleType("mmcv.runner")
        runner.load_checkpoint = lambda *a, **k: None
        mmcv.runner = runner
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.runner"] = runner
    import basicsr.utils as bu
    if not hasattr(bu, "imwrite"):
        bu.imwrite = lambda *a, **k: None
        bu.tensor2img = lambda *a, **k: None
    from modules import swin
    from archs import tdrqvae_arch
    ns = types.SimpleNamespace(swin=swin, tdrqvae=tdrqvae_arch)
    return ns


SMALL_DD_2D = dict(
    double_z=False, z_channels=32, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16],
    dropout=0.0, stages_atten=2, window_size=[2, 4, 4], num_head=4,
    # unused by 2D towers but present in schema
    depths=[1, 1], num_heads=[4, 4], window_sizes=[[4, 4], [4, 4]],
    num_frames=3)

SMALL_KW = dict(embed_dim=32, n_embed=64, decay=0.99, loss_type="mse",
                latent_loss_weight=0.25, bottleneck_type="rq",
                latent_shape=[16, 16, 32], code_shape=[16, 16, 1],
                shared_codebook=True, restart_unused_codes=True)


def _nchw(x):
    return np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2))


def test_rqvae_parity(reference):
    import torch
    torch.manual_seed(41)
    from archs import rqvae_arch
    ref = rqvae_arch.RQVAE(ddconfig=dict(SMALL_DD_2D), **SMALL_KW)
    ref.eval()
    cfg = VQVAEConfig.from_dict({**SMALL_KW, "ddconfig": SMALL_DD_2D})
    mod = RQVAE(cfg)
    rng = np.random.default_rng(41)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.3
    variables = mod.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    with torch.no_grad():
        out_ref, loss_ref, codes_ref = ref(torch.from_numpy(_nchw(x)))
    out, loss, codes = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(_nchw(out), out_ref.numpy(), atol=3e-4,
                               rtol=1e-3)


def test_swin3d_basiclayer_parity(reference_swin):
    import torch
    torch.manual_seed(42)
    ref = reference_swin.swin.BasicLayer(
        dim=32, depth=2, num_heads=4, window_size=(2, 4, 4))
    ref.eval()
    mod = BasicLayer3D(dim=32, depth=2, num_heads=4, window_size=(2, 4, 4))
    rng = np.random.default_rng(42)
    # D=3 (clamps the temporal window), H=W=8 (exercises shift+mask)
    x = rng.normal(size=(2, 3, 8, 8, 32)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = torch_state_dict_to_numpy(ref)
    # reference fuses the MLP inside the block with names mlp.fc1/fc2
    sd = {k.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2"): v
          for k, v in sd.items()}
    variables = port_torch_state_dict(variables, sd)
    with torch.no_grad():
        # reference BasicLayer I/O is [B, C, D, H, W]
        xt = torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))
        ref_out = ref(xt).numpy().transpose(0, 2, 3, 4, 1)
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, atol=5e-5, rtol=1e-4)


def test_tdrqvae_parity(reference_swin):
    import torch
    torch.manual_seed(43)
    ref = reference_swin.tdrqvae.TDRQVAE(
        ddconfig=dict(SMALL_DD_2D), tf=3, **SMALL_KW)
    ref.eval()
    cfg = VQVAEConfig.from_dict({**SMALL_KW, "tf": 3,
                                 "ddconfig": SMALL_DD_2D})
    mod = TDRQVAE(cfg)
    rng = np.random.default_rng(43)
    x = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32) * 0.3
    variables = mod.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    sd = torch_state_dict_to_numpy(ref)
    sd = {k.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2"): v
          for k, v in sd.items()}
    variables = port_torch_state_dict(variables, sd)
    xt = torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 1, 4, 2, 3)))  # [B,T,C,H,W]
    with torch.no_grad():
        out_ref, loss_ref, codes_ref = ref(xt)
    out, loss, codes = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=5e-5)
    ref_out_nhwc = out_ref.numpy().transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(out), ref_out_nhwc, atol=5e-4,
                               rtol=1e-3)
