"""RQBottleneck / EMA codebook parity with the reference + multi-device psum."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from pgtformer_tpu.models.quantizer import (
    RQBottleneck, ema_codebook_update, compute_distances)
from pgtformer_tpu.convert.torch_port import port_torch_state_dict
from tests.conftest import torch_state_dict_to_numpy


def _make_pair(reference, latent_shape, code_shape, n_embed, shared,
               restart=True, seed=0):
    import torch
    torch.manual_seed(seed)
    ref = reference.tdcrqvae3.RQBottleneck(
        latent_shape=list(latent_shape), code_shape=list(code_shape),
        n_embed=n_embed, decay=0.99, shared_codebook=shared,
        restart_unused_codes=restart)
    mod = RQBottleneck(latent_shape=latent_shape, code_shape=code_shape,
                       n_embed=n_embed, decay=0.99, shared_codebook=shared,
                       restart_unused_codes=restart)
    x = np.random.default_rng(seed).normal(
        size=(2, *latent_shape)).astype(np.float32)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "restart": jax.random.PRNGKey(1)},
        jnp.asarray(x))
    variables = port_torch_state_dict(variables,
                                      torch_state_dict_to_numpy(ref))
    return ref, mod, variables, x


def test_vq_forward_eval_parity(reference):
    import torch
    ref, mod, variables, x = _make_pair(
        reference, (8, 8, 16), (8, 8, 1), 64, shared=True)
    ref.eval()
    with torch.no_grad():
        q_ref, loss_ref, codes_ref = ref(torch.from_numpy(x))
    q, loss, codes = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())


def test_rq_depth4_space_to_depth_parity(reference):
    """depth-4 residual quantization + 2x2 space-to-depth code grid."""
    import torch
    ref, mod, variables, x = _make_pair(
        reference, (8, 8, 4), (4, 4, 4), 32, shared=False, seed=2)
    ref.eval()
    with torch.no_grad():
        q_ref, loss_ref, codes_ref = ref(torch.from_numpy(x))
    q, loss, codes = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())


def test_embed_code_parity(reference):
    import torch
    ref, mod, variables, x = _make_pair(
        reference, (8, 8, 16), (8, 8, 1), 64, shared=True, seed=3)
    ref.eval()
    with torch.no_grad():
        _, _, codes_ref = ref(torch.from_numpy(x))
        emb_ref = ref.embed_code(codes_ref)
    emb = mod.apply(variables, jnp.asarray(np.asarray(codes_ref)),
                    method=RQBottleneck.embed_code)
    np.testing.assert_allclose(np.asarray(emb), emb_ref.numpy(), atol=1e-5)


def test_soft_codes_parity(reference):
    import torch
    ref, mod, variables, x = _make_pair(
        reference, (8, 8, 16), (8, 8, 2), 64, shared=False, seed=4)
    ref.eval()
    with torch.no_grad():
        soft_ref, codes_ref = ref.get_soft_codes(torch.from_numpy(x), temp=0.7)
    soft, codes = mod.apply(variables, jnp.asarray(x), 0.7, False,
                            method=RQBottleneck.get_soft_codes)
    np.testing.assert_allclose(np.asarray(soft), soft_ref.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())


def test_ema_train_step_parity_no_restart(reference):
    """One training forward: EMA buffers and re-estimated weights must match
    (restart disabled: its randomness can't be aligned across frameworks)."""
    import torch
    ref, mod, variables, x = _make_pair(
        reference, (8, 8, 16), (8, 8, 1), 64, shared=True, restart=False,
        seed=5)
    ref.train()
    with torch.no_grad():
        q_ref, loss_ref, codes_ref = ref(torch.from_numpy(x))

    (q, loss, codes), updates = mod.apply(
        variables, jnp.asarray(x), train=True, mutable=["codebook"])
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())

    ref_sd = torch_state_dict_to_numpy(ref)
    new_cb = updates["codebook"]
    np.testing.assert_allclose(np.asarray(new_cb["codebooks_0_cluster_size_ema"]),
                               ref_sd["codebooks.0.cluster_size_ema"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_cb["codebooks_0_embed_ema"]),
                               ref_sd["codebooks.0.embed_ema"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_cb["codebooks_0_weight"]),
                               ref_sd["codebooks.0.weight"], atol=1e-4)
    # outputs use the pre-update codebook in both frameworks
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=1e-5)


def test_ema_psum_matches_single_device():
    """Sharded EMA update over a 8-device data axis == full-batch update."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    n_embed, dim = 32, 8
    rng = np.random.default_rng(0)
    weight = rng.normal(size=(n_embed + 1, dim)).astype(np.float32)
    weight[-1] = 0
    cs = np.abs(rng.normal(size=(n_embed,))).astype(np.float32)
    ema = rng.normal(size=(n_embed, dim)).astype(np.float32)
    vecs = rng.normal(size=(64, dim)).astype(np.float32)
    idxs = rng.integers(0, n_embed, size=(64,))

    ref_w, ref_cs, ref_ema = ema_codebook_update(
        jnp.asarray(weight), jnp.asarray(cs), jnp.asarray(ema),
        jnp.asarray(vecs), jnp.asarray(idxs),
        decay=0.99, restart_unused_codes=False, rng=None, axis_name=None)

    mesh = Mesh(np.array(devs[:8]), ("data",))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P("data"), P("data")),
             out_specs=(P(), P(), P()))
    def sharded(w, c, e, v, i):
        return ema_codebook_update(
            w, c, e, v, i, decay=0.99, restart_unused_codes=False,
            rng=None, axis_name="data")

    out_w, out_cs, out_ema = sharded(
        jnp.asarray(weight), jnp.asarray(cs), jnp.asarray(ema),
        jnp.asarray(vecs), jnp.asarray(idxs))
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cs), np.asarray(ref_cs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_ema), np.asarray(ref_ema), atol=1e-5)
