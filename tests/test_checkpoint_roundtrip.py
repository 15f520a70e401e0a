"""Real-checkpoint path: a COMPLETE reference PGTFormer state_dict (random
weights) round-trips file -> CLI --weights -> restored video, exercising the
exact code path `kepeng/pgtformer-base` will take (reference
inference.py:109-121; inference_cn.py loads `params_ema` the same way)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_weights_roundtrip_restores_video(reference, tmp_path, capsys):
    import cv2
    import torch
    import yaml

    # 1) complete reference state_dict at the DEPLOYED 512px geometry,
    #    saved in the BasicSR convention ({'params_ema': sd})
    torch.manual_seed(3)
    with open("/root/reference/options/"
              "release_test_stage_IIII_dont_need_align_version.yml") as f:
        opt = yaml.safe_load(f)
    net_kwargs = dict(opt["network_g"])
    net_kwargs.pop("type")
    ref = reference.pgtformer.PGTFormer(**net_kwargs)
    ckpt_path = str(tmp_path / "net_g.pth")
    torch.save({"params_ema": ref.state_dict()}, ckpt_path)

    # 2) tiny 512px input video (3 frames -> minimal CPU compute)
    in_path = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(in_path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (512, 512))
    rng = np.random.default_rng(0)
    gx = np.linspace(0, 255, 512, dtype=np.float32)
    base = np.stack([np.tile(gx, (512, 1))] * 3, -1).astype(np.uint8)
    for i in range(3):
        vw.write(np.roll(base, 16 * i, axis=1))
    vw.release()

    # 3) CLI: port the checkpoint, restore the video
    out_path = str(tmp_path / "out.mp4")
    from pgtformer_tpu.cli import main
    rc = main(["-i", in_path, "-o", out_path, "--weights", ckpt_path,
               "--batch", "1", "--fp32", "--codec", "libx264"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "random weights" not in err  # the ported ckpt was actually used

    cap = cv2.VideoCapture(out_path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    assert len(frames) == 3
    assert frames[0].shape == (512, 512, 3)
    arr = np.stack(frames)
    assert arr.std() > 1.0  # not collapsed/blank output
