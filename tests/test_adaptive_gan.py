"""Adaptive GAN weighting (taming-style last-layer gradient ratio)."""

import dataclasses

import numpy as np
import jax

from tests.test_train import SMALL_VQ, SMALL_PGT, SMALL_DISC, FAST_HP, _batch
from pgtformer_tpu.train.stages import (
    Stage1Trainer, PGTFormerTrainer, StageHyper, STAGE_HYPERS)
from pgtformer_tpu.models.vae import TDCRQVAE3


def test_stage1_adaptive_weight_runs():
    hp = dataclasses.replace(FAST_HP, gan_weight_mode="adaptive")
    trainer = Stage1Trainer(SMALL_VQ, hp, disc=SMALL_DISC)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch["gt"])
    state, metrics = trainer.make_step()(state, batch["gt"])
    w = float(metrics["d_weight"])
    assert np.isfinite(w) and 0.0 <= w <= 1e4
    assert np.isfinite(float(metrics["l_g_total"]))


def test_stage4_adaptive_weight_runs():
    import jax.numpy as jnp
    hp = dataclasses.replace(STAGE_HYPERS["IV"], milestones=(100,),
                             gan_weight_mode="adaptive")
    trainer = PGTFormerTrainer(SMALL_PGT, stage="IV", hp=hp, disc=SMALL_DISC)
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    teacher = TDCRQVAE3(SMALL_VQ)
    t_vars = teacher.init({"params": jax.random.PRNGKey(7)},
                          jnp.asarray(batch["gt"]))
    state = trainer.init_state(jax.random.PRNGKey(2), batch["lq"], t_vars)
    state, metrics = trainer.make_step()(state, batch)
    w = float(metrics["d_weight"])
    assert np.isfinite(w) and 0.0 <= w <= 1e4
