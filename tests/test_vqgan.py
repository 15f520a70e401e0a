"""VQGAN-family parity: quantizers, autoencoder towers, discriminator,
CodeFormer baseline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.models.vqgan import (
    VQAutoEncoder, VQGANDiscriminator, VectorQuantizer)
from pgtformer_tpu.models.codeformer import CodeFormer
from pgtformer_tpu.convert.torch_port import port_torch_state_dict
from tests.conftest import torch_state_dict_to_numpy


def _nchw(x):
    return np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2))


def test_vector_quantizer_parity(reference):
    import torch
    torch.manual_seed(31)
    ref = reference.vqgan.VectorQuantizer(64, 16, 0.25)
    ref.eval()
    rng = np.random.default_rng(31)
    z = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    mod = VectorQuantizer(64, 16, 0.25)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(z))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    with torch.no_grad():
        zq_ref, loss_ref, stats_ref = ref(torch.from_numpy(_nchw(z)))
    zq, loss, stats = mod.apply(variables, jnp.asarray(z))
    np.testing.assert_allclose(_nchw(zq), zq_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(stats["min_encoding_indices"]),
        stats_ref["min_encoding_indices"].numpy().ravel())
    np.testing.assert_allclose(float(stats["perplexity"]),
                               float(stats_ref["perplexity"]), atol=1e-4)


def test_vqautoencoder_parity(reference):
    import torch
    torch.manual_seed(32)
    ref = reference.vqgan.VQAutoEncoder(
        img_size=64, nf=32, ch_mult=[1, 2], res_blocks=1,
        attn_resolutions=[32], codebook_size=64, emb_dim=32)
    ref.eval()
    rng = np.random.default_rng(32)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3
    mod = VQAutoEncoder(img_size=64, nf=32, ch_mult=(1, 2), res_blocks=1,
                        attn_resolutions=(32,), codebook_size=64, emb_dim=32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    with torch.no_grad():
        out_ref, loss_ref, _ = ref(torch.from_numpy(_nchw(x)))
    out, loss, _ = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(_nchw(out), out_ref.numpy(), atol=2e-4,
                               rtol=1e-3)


def test_discriminator_parity(reference):
    import torch
    torch.manual_seed(33)
    ref = reference.vqgan.VQGANDiscriminator(nc=3, ndf=16, n_layers=2)
    ref.eval()
    rng = np.random.default_rng(33)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    mod = VQGANDiscriminator(nc=3, ndf=16, n_layers=2)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(_nchw(x))).numpy()
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(_nchw(out), out_ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_codeformer_parity(reference):
    """Full default-config CodeFormer at 512x512 (slow on CPU)."""
    import torch
    torch.manual_seed(34)
    ref = reference.codeformer.CodeFormer(fix_modules=None)
    ref.eval()
    rng = np.random.default_rng(34)
    x = rng.uniform(0, 1, size=(1, 512, 512, 3)).astype(np.float32)
    mod = CodeFormer(w=1.0, adain=True)
    shapes = jax.eval_shape(
        lambda: mod.init(jax.random.PRNGKey(0), jnp.asarray(x), w=1.0))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    with torch.no_grad():
        out_ref, logits_ref, _ = ref(torch.from_numpy(_nchw(x)), w=1.0,
                                     adain=True)
    out, logits, _ = mod.apply(variables, jnp.asarray(x), w=1.0, adain=True)
    codes_ref = logits_ref.argmax(-1).numpy()
    codes = np.asarray(jnp.argmax(logits, axis=-1))
    assert (codes == codes_ref).mean() > 0.999
    np.testing.assert_allclose(_nchw(out), out_ref.numpy(), atol=5e-3,
                               rtol=1e-2)
