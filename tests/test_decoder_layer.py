"""Cross-frame DecoderLayer parity with the reference (the W-MCA path —
unused by the deployed model but part of the component inventory)."""

import numpy as np
import jax
import jax.numpy as jnp

from pgtformer_tpu.nn.blocks import DecoderLayer
from pgtformer_tpu.convert.torch_port import port_torch_state_dict
from tests.conftest import torch_state_dict_to_numpy


def _to5(a):  # [B,T,H,W,C] -> [B,T,C,H,W]
    return np.ascontiguousarray(a.transpose(0, 1, 4, 2, 3))


def test_decoder_layer_parity(reference):
    import torch
    torch.manual_seed(61)
    ref = reference.rstt_layers.DecoderLayer(
        dim=32, depth=2, num_heads=4, num_frames=3, window_size=(4, 4),
        mlp_ratio=1)
    ref.eval()
    rng = np.random.default_rng(61)
    x = rng.normal(size=(2, 3, 8, 8, 32)).astype(np.float32)
    kv = rng.normal(size=(2, 3, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_to5(x)),
                      torch.from_numpy(_to5(kv))).numpy()

    mod = DecoderLayer(dim=32, depth=2, num_heads=4, num_frames=3,
                       window_size=(4, 4), mlp_ratio=1.0)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(kv))
    v = port_torch_state_dict(v, torch_state_dict_to_numpy(ref))
    out = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(kv)))
    np.testing.assert_allclose(_to5(out), ref_out, atol=5e-5, rtol=1e-4)
