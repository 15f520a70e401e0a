"""Config system: reference YAMLs load unmodified into typed configs;
train CLI option parsing."""

import numpy as np
import pytest

from pgtformer_tpu.config import (
    load_options, pgtformer_config_from_options, vqvae_config_from_options,
    DDConfig, RELEASE_PGTFORMER)

REF_TEST_YML = ("/root/reference/options/"
                "release_test_stage_IIII_dont_need_align_version.yml")
REF_STAGE1_YML = ("/root/reference/options/"
                  "release_train_stage_I_need_align_version.yml")


pytestmark = pytest.mark.quick


def test_release_yaml_roundtrip():
    opt = load_options(REF_TEST_YML)
    cfg = pgtformer_config_from_options(opt)
    assert cfg.w == 1 and cfg.adain is True
    assert cfg.vqvae.n_embed == 1024
    assert cfg.vqvae.latent_shape == (32, 32, 512)
    assert cfg.vqvae.ddconfig.ch_mult == (1, 2, 4, 4, 8)
    assert cfg.vqvae.ddconfig.attn_resolutions == (32, 64, 128)
    assert cfg.vqvae.ddconfig.window_sizes == ((4, 4),) * 5
    # matches the inlined release config
    assert cfg == RELEASE_PGTFORMER

    teacher = vqvae_config_from_options(opt, "network_gt")
    assert teacher.ddconfig == cfg.vqvae.ddconfig


def test_stage1_yaml_and_hyper_extraction():
    opt = load_options(REF_STAGE1_YML)
    cfg = vqvae_config_from_options(opt, network_key="network_g")
    assert cfg.ddconfig.resolution == 512

    from pgtformer_tpu.train_cli import build_from_options
    trainer, hp = build_from_options(opt, "I", "/nonexistent")
    assert hp.lr_g == 4e-5
    assert hp.warmup_iter == 20000
    assert hp.total_iter == 800000
    assert hp.milestones == (800000,)
    assert hp.gan_weight == 0.75


def test_stage4_hyper_extraction():
    opt = load_options("/root/reference/options/"
                       "release_train_stage_IIII_dont_need_align_version.yml")
    from pgtformer_tpu.train_cli import build_from_options
    trainer, hp = build_from_options(opt, "IV", "/nonexistent")
    assert hp.token_loss == "focal"
    assert hp.pixel_loss == "gradl1"
    assert hp.perceptual == "temporal_lpips"
    assert hp.lr_g == 2e-5
    assert trainer.cfg.vqvae.ddconfig.ch == 64


def test_level_resolutions():
    dd = DDConfig()
    assert dd.level_resolutions() == (512, 256, 128, 64, 32)
