"""train_cli end-to-end smoke: YAML -> concurrent loader -> stage-I steps.

Covers the wiring the reference exercises via `python basicsr/train.py
-opt <yml>` (SURVEY.md §3.2) at tiny geometry, including the round-3
PrefetchLoader path (num_worker_per_gpu analog)."""

import os

import numpy as np
import pytest


TINY_YAML = """
name: tiny_stage1
model_type: TRQVAEModel
manual_seed: 0
datasets:
  train:
    name: tiny
    type: VFHQFULLntmeBASICV2TRAINUP
    r: 1
    is_aligned: false
    degradation: blr
    use_hflip: true
    batch_size_per_gpu: 2
    num_worker_per_gpu: 2
network_g:
  type: TDCRQVAE3
  embed_dim: 32
  n_embed: 32
  decay: 0.99
  loss_type: mse
  latent_loss_weight: 0.25
  bottleneck_type: rq
  latent_shape: [8, 8, 32]
  code_shape: [8, 8, 1]
  shared_codebook: true
  restart_unused_codes: true
  tf: 3
  ddconfig:
    double_z: false
    z_channels: 32
    resolution: 16
    in_channels: 3
    out_ch: 3
    ch: 32
    ch_mult: [1, 2]
    depths: [1, 1]
    num_heads: [2, 2]
    window_sizes: [[4, 4], [4, 4]]
    num_frames: 3
    num_res_blocks: 1
    attn_resolutions: [8]
    dropout: 0.0
train:
  optim_g: {lr: 4.0e-5}
  optim_d: {lr: 4.0e-5}
  scheduler: {milestones: [100], gamma: 0.5}
  warmup_iter: -1
  total_iter: 3
  ema_decay: 0.999
logger: {print_freq: 1, save_checkpoint_freq: 1000}
"""


@pytest.mark.slow
def test_train_cli_stage1_smoke(tmp_path):
    import cv2
    root = tmp_path / "vfhq"
    rng = np.random.default_rng(0)
    for clip in ("clip_a", "clip_b"):
        os.makedirs(root / "GT" / clip)
        for i in range(5):
            img = rng.uniform(0, 255, (16, 16, 3)).astype(np.uint8)
            cv2.imwrite(str(root / "GT" / clip / f"{i:08d}.png"), img)
    yml = tmp_path / "tiny.yml"
    yml.write_text(TINY_YAML)

    from pgtformer_tpu.train_cli import main
    # --devices 1: the 8-virtual-device shard_map compile of the GAN train
    # step takes >10 min on this CPU; the mesh path is covered by
    # test_train.py::test_stage1_multi_device_matches_single
    rc = main(["-opt", str(yml), "--data-root", str(root),
               "--exp-dir", str(tmp_path / "exp"), "--stage", "I",
               "--no-lpips", "--total-iter", "3", "--devices", "1"])
    assert rc == 0
    # checkpoints + logs land in exp dir
    assert os.path.isdir(tmp_path / "exp")


def test_detect_stage():
    """Stage resolution: `stage:` key first, then longest filename match.

    Regressions pinned: `demo_stage_II.yml` must NOT fall through to IV
    (the old `"stage_II_"` check needed a trailing underscore), and the
    reference's `..._stage_IIII_...` must resolve to IV, not III
    (substring collision)."""
    from pgtformer_tpu.train_cli import detect_stage
    import pytest as _pytest

    # the reference's own YAML names (options/*.yml)
    assert detect_stage({}, "release_train_stage_I_need_align_version.yml") == "I"
    assert detect_stage({}, "release_train_stage_II_need_align_version.yml") == "II"
    assert detect_stage({}, "release_train_stage_III__need_align_version.yml") == "III"
    assert detect_stage({}, "release_train_stage_IIII_dont_need_align_version.yml") == "IV"
    # this repo's demo/train configs (dotted + Roman-IV names)
    for n, want in [("demo_stage_I.yml", "I"), ("demo_stage_II.yml", "II"),
                    ("demo_stage_III.yml", "III"), ("demo_stage_IV.yml", "IV")]:
        assert detect_stage({}, f"configs/{n}") == want
    # only the FILENAME is sniffed — stage-named directories don't override
    assert detect_stage(
        {}, "exp/stage_II_sweeps/release_train_stage_I_need_align_version.yml"
    ) == "I"
    with _pytest.raises(SystemExit):
        detect_stage({}, "/data/stage_IV/demo_no_hints.yml")
    # explicit key wins over the filename
    assert detect_stage({"stage": "II"}, "whatever.yml") == "II"
    assert detect_stage({"stage": 4}, "demo_stage_I.yml") == "IV"
    # model_type convention (reference yml:2 names the BasicSR model class)
    assert detect_stage({"model_type": "TRQVAEModel"}, "x.yml") == "I"
    assert detect_stage({"model_type": "TRQCodeFormerModel",
                         "code_only": True}, "x.yml") == "II"
    # refuse to guess instead of training the wrong recipe
    with _pytest.raises(SystemExit):
        detect_stage({"model_type": "TRQCodeFormerModel"}, "x.yml")
    with _pytest.raises(SystemExit):
        detect_stage({"stage": "V"}, "x.yml")
