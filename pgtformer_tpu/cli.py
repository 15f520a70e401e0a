"""Video restoration CLI — flag-compatible with the reference
(`python inference.py -i in.mp4 -o out.mp4`, reference inference.py:123-157).

Usage:
    python -m pgtformer_tpu.cli -i input.mp4 -o output.mp4 \
        [--weights weights.pth] [--fidelity 1.0] [--batch 4] [--fp32]

Weights: a reference-format torch checkpoint (HF `kepeng/pgtformer-base`
pytorch_model.bin / safetensors, or a BasicSR net_g .pth with `params_ema`)
is ported on the fly.  Without weights the model runs randomly initialized
(pipeline smoke-testing only) and a loud warning is printed.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def load_variables(model, cfg, weights_path, sample_shape, dtype):
    from pgtformer_tpu.convert.torch_port import (
        port_torch_state_dict, load_torch_checkpoint)

    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros(sample_shape, jnp.float32), w=1.0))
    if weights_path:
        sd = load_torch_checkpoint(weights_path)
        zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        return port_torch_state_dict(zeros, sd)
    print("WARNING: no --weights given; running with random weights "
          "(pipeline smoke test only).", file=sys.stderr)
    # jitted init: eager init over the axon tunnel pays ~1ms RPC per op
    return jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros(sample_shape, jnp.float32), w=1.0))(
            jax.random.PRNGKey(0))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="PGTFormer-TPU blind video face restoration")
    parser.add_argument("-i", "--input_video", type=str, required=True,
                        help="Input video file path")
    parser.add_argument("-o", "--output_video", type=str, required=True,
                        help="Output video file path")
    parser.add_argument("--weights", type=str, default=None,
                        help="Reference-format torch checkpoint to port")
    parser.add_argument("--fidelity", "-w", type=float, default=1.0,
                        help="Fidelity knob w (reference model(x, w=...))")
    parser.add_argument("--batch", type=int, default=8,
                        help="Sliding windows per device step")
    parser.add_argument("--fp32", action="store_true",
                        help="Compute in float32 (default bfloat16)")
    parser.add_argument("--dump-frames", type=str, default=None,
                        help="Also dump restored frames as PNGs into this "
                             "directory (reference easy_inference_in_windows"
                             ".py workflow)")
    parser.add_argument("--codec", type=str, default="auto",
                        choices=["auto", "libx265", "libx264", "mpeg4"],
                        help="Output codec; 'auto' prefers libx265 CRF18 "
                             "hvc1 (the reference's output format, "
                             "inference.py:30-35) with x264/mpeg4 fallback")
    parser.add_argument("--encoder-preset", type=str, default=None,
                        help="x264/x265 speed preset (e.g. ultrafast, "
                             "superfast, fast, medium); trades encode CPU "
                             "for bitrate at the same CRF 18. On 1-core "
                             "hosts the x265 encode thread is the e2e "
                             "bottleneck - 'superfast' is a good choice")
    parser.add_argument("--codec-params", type=str, default=None,
                        help="comma-separated k=v private encoder options "
                             "(e.g. 'pools=1,frame-threads=4'); x265 "
                             "ultrafast + frame-threads=4 sustains >40 fps "
                             "on one core (BASELINE.md x265 scaling table)")
    parser.add_argument("--readback", type=str, default="auto",
                        choices=("auto", "rgb", "yuv420"),
                        help="device->host transfer format: yuv420 converts "
                             "to BT.601 YUV420P on-device (half the bytes, "
                             "no host swscale; needs the native writer); "
                             "auto picks yuv420 unless --dump-frames/"
                             "--encode-quality-check need host RGB")
    parser.add_argument("--inflight", type=int, default=3,
                        help="device chunks in flight before readback "
                             "(deeper = better latency hiding on remote "
                             "tunnels, more HBM)")
    parser.add_argument("--encode-quality-check", action="store_true",
                        help="After writing, re-decode the output and report "
                             "encoded-vs-restored PSNR/SSIM on sampled "
                             "frames (stand-in for the reference's bundled "
                             "VMAF models, ffmpeg_lib/model/)")
    parser.add_argument("--vmaf-model", type=str, default=None,
                        help="VMAF model JSON for --encode-quality-check "
                             "(default: vendored vmaf_v0.6.1.json; env "
                             "PGT_VMAF_MODEL also honored)")
    from pgtformer_tpu import knobs
    knobs.add_cli_flags(parser)
    args = parser.parse_args(argv)
    knobs.apply_cli_args(args)

    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.pipeline import VideoRestorer
    from pgtformer_tpu.models.pgtformer import PGTFormer

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = RELEASE_PGTFORMER
    model = PGTFormer(cfg, dtype=dtype)
    res = cfg.vqvae.ddconfig.resolution
    sample_shape = (1, cfg.vqvae.tf, res, res, 3)
    variables = load_variables(model, cfg, args.weights, sample_shape, dtype)

    readback = args.readback
    if readback == "auto":
        needs_rgb = bool(args.dump_frames or args.encode_quality_check)
        try:
            from pgtformer_tpu.io import native as _native
            _native.load_library()
            has_native = True
        except Exception:
            has_native = False
        readback = "rgb" if (needs_rgb or not has_native
                             or res % 2) else "yuv420"
    restorer = VideoRestorer(variables, cfg, w=args.fidelity,
                             batch_windows=args.batch, dtype=dtype,
                             inflight=args.inflight, readback=readback)
    cbs = []
    if args.dump_frames:
        import cv2
        os.makedirs(args.dump_frames, exist_ok=True)
        cbs.append(lambda i, rgb: cv2.imwrite(
            os.path.join(args.dump_frames, f"{i:08d}.png"), rgb[..., ::-1]))

    qcheck_samples = {}
    if args.encode_quality_check:
        stride = 16
        # stride samples feed PSNR/SSIM; the first 16 CONSECUTIVE frames
        # feed VMAF (motion2 needs neighboring frames)
        cbs.append(lambda i, rgb: qcheck_samples.update({i: rgb.copy()})
                   if (i % stride == 0 and len(qcheck_samples) < 32)
                   or i < 16 else None)

    frame_cb = None
    if cbs:
        def frame_cb(i, rgb):
            for cb in cbs:
                cb(i, rgb)

    codec = args.codec
    if args.encoder_preset and codec != "mpeg4":
        codec = f"{codec}:preset={args.encoder_preset}"
    if args.codec_params and codec != "mpeg4":
        codec = f"{codec}:params={args.codec_params}"
    stats = restorer.restore_video(args.input_video, args.output_video,
                                   progress=True, frame_callback=frame_cb,
                                   codec=codec)
    print(f"restored {stats['frames']} frames in {stats['seconds']:.1f}s "
          f"({stats['fps']:.2f} fps; steady {stats['steady_fps']:.2f} fps, "
          f"startup {stats['compile_seconds']:.1f}s)")
    phases = stats.get("phases", {})
    if phases:
        parts = [f"{k} {v['total_s']:.1f}s" for k, v in phases.items()]
        print("phase totals: " + ", ".join(parts))

    if args.encode_quality_check and qcheck_samples:
        from pgtformer_tpu.eval.metrics import calculate_psnr, calculate_ssim
        from pgtformer_tpu.eval import vmaf as vmaf_mod
        from pgtformer_tpu.pipeline import _open_reader
        model_path = args.vmaf_model or vmaf_mod.DEFAULT_MODEL
        scorer = (vmaf_mod.VmafScorer(model_path)
                  if os.path.exists(model_path) else None)
        rd = _open_reader(args.output_video, "auto")
        psnrs, ssims = [], []
        for i, enc in enumerate(rd):
            if i in qcheck_samples:
                a = enc.astype(np.float32) / 255.0
                b = qcheck_samples[i].astype(np.float32) / 255.0
                if i % 16 == 0:
                    psnrs.append(calculate_psnr(a, b))
                    ssims.append(calculate_ssim(a, b))
                if scorer is not None and i < 16:
                    # ref = restored frames, dis = encoded output
                    scorer.update(b, a)
        rd.close()
        if psnrs:
            print(f"encode quality ({len(psnrs)} sampled frames): "
                  f"psnr {np.mean(psnrs):.2f} dB, ssim {np.mean(ssims):.4f} "
                  "(encoded vs restored)")
        if scorer is not None and scorer.finish():
            # own clean-room implementation of the shipped model
            # (ffmpeg_lib/model/vmaf_v0.6.1.json) — labeled, see eval/vmaf.py
            print(f"vmaf(own-impl) (first {len(scorer.finish())} frames): "
                  f"{scorer.mean():.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
