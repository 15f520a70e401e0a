"""Gradient-semantics tests: straight-through estimator, commitment loss,
frozen-parser invariance."""

import numpy as np
import jax
import jax.numpy as jnp

from pgtformer_tpu.models.quantizer import RQBottleneck


def _make(seed=0):
    mod = RQBottleneck(latent_shape=(8, 8, 16), code_shape=(8, 8, 1),
                       n_embed=32, decay=0.99, shared_codebook=True,
                       restart_unused_codes=False)
    x = jnp.asarray(np.random.default_rng(seed)
                    .normal(size=(2, 8, 8, 16)).astype(np.float32))
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    return mod, variables, x


def test_ste_gradient_is_identity():
    """d(quantized)/dx == I: gradients pass straight through the argmin
    (reference tdcrqvae3_arch.py:336 `x + (q - x).detach()`)."""
    mod, variables, x = _make()

    def f(x):
        q, _, _ = mod.apply(variables, x)
        return jnp.sum(q * jnp.cos(x))  # arbitrary downstream fn

    g = jax.grad(f)(x)
    # by STE: d(sum q*cos x)/dx = cos(x) + q * (-sin x)
    q, _, _ = mod.apply(variables, x)
    expected = jnp.cos(x) - q * jnp.sin(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected),
                               atol=1e-5)


def test_commitment_loss_gradient():
    """Commitment pulls x toward the (detached) quantized values:
    d/dx mean((x - sg(q))^2) = 2 (x - q) / N."""
    mod, variables, x = _make(1)

    def f(x):
        _, commit, _ = mod.apply(variables, x)
        return commit

    g = jax.grad(f)(x)
    q_raw, _, codes = mod.apply(variables, x)
    # recover the raw (pre-STE) quantized values: q_raw == x + sg(q-x) == q
    expected = 2.0 * (x - q_raw) / x.size
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected),
                               atol=1e-5)


def test_codes_have_no_gradient_path():
    """Code indices are integers — no cotangents flow through argmin."""
    mod, variables, x = _make(2)

    def f(x):
        q, commit, codes = mod.apply(variables, x)
        return jnp.sum(q) + commit

    # must not raise (argmin/int path excluded from AD) and be finite
    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
