"""Training dynamics: losses actually decrease over a short run; remat
(gradient checkpointing) path compiles and matches the plain path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train import SMALL_VQ, SMALL_PGT, SMALL_DISC, FAST_HP, _batch
from pgtformer_tpu.train.stages import Stage1Trainer, StageHyper
from pgtformer_tpu.config import VQVAEConfig
from pgtformer_tpu.models.vae import TDCRQVAE3
import dataclasses


def test_stage1_loss_decreases():
    """30 steps of stage-I on a fixed batch: reconstruction must improve."""
    hp = StageHyper(lr_g=2e-3, lr_d=1e-4, milestones=(1000,),
                    total_iter=1000, gan_start_iter=10 ** 9)  # GAN off
    trainer = Stage1Trainer(SMALL_VQ, hp, disc=SMALL_DISC)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch["gt"])
    step = trainer.make_step()
    first = None
    for i in range(30):
        state, metrics = step(state, batch["gt"])
        if first is None:
            first = float(metrics["l_pix"])
    last = float(metrics["l_pix"])
    assert last < first * 0.8, (first, last)
    # EMA params trail the online params
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b.astype(a.dtype)).max()),
                     state.g.ema_params, state.g.params)
    assert max(jax.tree.leaves(d)) > 0


def test_remat_checkpointing_matches_plain():
    """checkpointing=True (jax.remat) produces identical outputs and grads."""
    cfg_plain = SMALL_VQ
    cfg_remat = dataclasses.replace(SMALL_VQ, checkpointing=True)
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(0, 1, (1, 3, 32, 32, 3)).astype(np.float32))
    plain = TDCRQVAE3(cfg_plain)
    remat = TDCRQVAE3(cfg_remat)
    variables = plain.init({"params": jax.random.PRNGKey(0)}, x)

    out_p, ql_p, codes_p = plain.apply(variables, x)
    out_r, ql_r, codes_r = remat.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(codes_p), np.asarray(codes_r))

    def loss(params, mod):
        out, ql, _ = mod.apply(
            {"params": params, "codebook": variables["codebook"]}, x)
        return jnp.mean((out - 0.5) ** 2) + 0.25 * ql

    g_p = jax.grad(loss)(variables["params"], plain)
    g_r = jax.grad(loss)(variables["params"], remat)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_p, g_r)
    assert max(jax.tree.leaves(diff)) < 1e-5
