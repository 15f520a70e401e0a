"""Evaluation CLI — VFHQ-Test metrics (the reference's `val:` loop,
options/...yml:148-175: PSNR/SSIM/LPIPS(/NIQE) over the test split).

    python -m pgtformer_tpu.eval_cli --data-root /data/vfhq \
        --weights pgtformer-base.pth [--rotate] [--inter-space 10] \
        [--save-dir exp/val_imgs] [--niqe-params niqe_pris_params.npz]
        [--niqe-fit-gt] [--face-metrics]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="pgtformer_tpu evaluation")
    parser.add_argument("--data-root", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--fidelity", "-w", type=float, default=1.0)
    parser.add_argument("--inter-space", type=int, default=1,
                        help="evaluate every k-th frame (reference "
                             "V2TESTUP inter_space)")
    parser.add_argument("--rotate", action="store_true",
                        help="±30° rotation robustness eval "
                             "(reference V2TESTUPROTATE)")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--niqe-params", default=None)
    parser.add_argument("--niqe-fit-gt", action="store_true",
                        help="no-reference NIQE with the pristine MVG "
                             "fitted from THIS eval set's GT frames "
                             "(labeled 'niqe(gt-fit)'; exercises the full "
                             "NIQE pipeline but is NOT comparable to "
                             "scores under BasicSR's niqe_pris_params.npz "
                             "— pass --niqe-params for those)")
    parser.add_argument("--lpips-weights", default=None,
                        help="lpips.LPIPS(net='vgg') state_dict for "
                             "metric-grade LPIPS (random VGG otherwise)")
    parser.add_argument("--arcface-weights", default=None,
                        help="insightface arcface_torch iresnet50 "
                             "backbone.pth for metric-grade Deg (the "
                             "gray-patch proxy embedder otherwise)")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--face-metrics", action="store_true",
                        help="also emit Deg/LMD/TLME/MSRL (reference "
                             "README.md:127) via the pluggable "
                             "landmark/embedder fallbacks (eval/landmarks.py)")
    from pgtformer_tpu import knobs
    knobs.add_cli_flags(parser)
    args = parser.parse_args(argv)
    knobs.apply_cli_args(args)

    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.models.pgtformer import PGTFormer
    from pgtformer_tpu.cli import load_variables
    from pgtformer_tpu.data.vfhq import (
        VFHQTestDataset, VFHQRotateTestDataset, clip_batches)
    from pgtformer_tpu.eval.metrics import (
        calculate_psnr, calculate_ssim, calculate_lpips_fn)

    cfg = RELEASE_PGTFORMER
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = PGTFormer(cfg, dtype=dtype,
                      use_pallas=jax.default_backend() != "cpu")
    res = cfg.vqvae.ddconfig.resolution
    T = cfg.vqvae.tf
    variables = load_variables(model, cfg, args.weights,
                               (1, T, res, res, 3), dtype)

    ds_cls = VFHQRotateTestDataset if args.rotate else VFHQTestDataset
    dataset = ds_cls(args.data_root, r=(T - 1) // 2, degradation="blr",
                     inter_space=args.inter_space)

    @jax.jit
    def forward(variables, lq):
        out, _, _ = model.apply(variables, lq, w=args.fidelity)
        B = lq.shape[0]
        out = out.reshape(B, T, *out.shape[1:])[:, T // 2]
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    lpips_metric = calculate_lpips_fn(weights_path=args.lpips_weights)
    niqe_fn = None
    niqe_fit = None
    if args.niqe_params:
        from pgtformer_tpu.eval.niqe import calculate_niqe
        niqe_fn = lambda img: calculate_niqe(img, args.niqe_params)
    if args.niqe_fit_gt:   # independent of --niqe-params; both can emit
        niqe_fit = {"out": [], "gt": []}

    face = None
    if args.face_metrics:
        from pgtformer_tpu.eval.landmarks import (
            ParserLandmarkDetector, GrayPatchEmbedder)
        cond_vars = {"params": variables["params"]["conditionnet"]}
        if "batch_stats" in variables:
            cond_vars["batch_stats"] = variables["batch_stats"]["conditionnet"]
        detector = ParserLandmarkDetector(cond_vars)
        # column labels mark non-metric-grade fallbacks at the output
        # surface so no table can be mistaken for paper-comparable numbers
        # (MSRL has no public definition at all — eval/landmarks.py)
        labels = {"lmd": "lmd(parser-lm)", "tlme": "tlme(parser-lm)",
                  "msrl": "msrl(own-def)"}
        if args.arcface_weights:
            from pgtformer_tpu.eval.arcface import ArcFaceEmbedder
            embedder = ArcFaceEmbedder(args.arcface_weights,
                                       detector=detector)
            labels["deg"] = "deg"          # metric-grade
        else:
            embedder = GrayPatchEmbedder()
            labels["deg"] = "deg(proxy-embedder)"
        face = {"detector": detector, "embedder": embedder,
                "labels": labels,
                "clip_lms": {}}  # clip -> list of (lm_pred, lm_gt)

    rows = []
    n = 0
    for batch in clip_batches(dataset, args.batch, drop_last=False):
        lq = jnp.asarray(batch["lq"])
        if lq.shape[0] != args.batch:  # avoid a recompile for the tail
            for i in range(lq.shape[0]):
                rows_batch = forward(
                    variables, jnp.repeat(lq[i:i + 1], args.batch, 0))
                out_i = np.asarray(rows_batch)[0]
                _accumulate(rows, out_i, batch, i, lpips_metric, niqe_fn,
                            args, T, face, niqe_fit)
                n += 1
        else:
            outs = np.asarray(forward(variables, lq))
            for i, out_i in enumerate(outs):
                _accumulate(rows, out_i, batch, i, lpips_metric, niqe_fn,
                            args, T, face, niqe_fit)
                n += 1
        if args.limit and n >= args.limit:
            break

    if not rows:
        print("no samples evaluated", file=sys.stderr)
        return 1
    if niqe_fit is not None and niqe_fit["gt"]:
        # pristine MVG from the GT frames, then score every output —
        # the same Mahalanobis machinery as the published model, with a
        # corpus swap (see eval/niqe.py fit_pris_params docstring)
        from pgtformer_tpu.eval.niqe import fit_pris_params, \
            niqe_from_features
        mu_p, cov_p = fit_pris_params(niqe_fit["gt"])
        for row, feats in zip(rows, niqe_fit["out"]):
            row["niqe(gt-fit)"] = niqe_from_features(feats, mu_p, cov_p)
    keys = rows[0].keys()
    print("samples:", len(rows))
    for k in keys:
        vals = [r[k] for r in rows]
        print(f"{k}: {np.mean(vals):.4f}")
    if face is not None:
        # TLME needs landmark *sequences*: frame-to-frame motion error per
        # clip, averaged over clips (eval/metrics.py temporal_landmark_error)
        from pgtformer_tpu.eval.metrics import temporal_landmark_error
        tlmes = []
        for clip, lms in face["clip_lms"].items():
            if len(lms) >= 2:
                lp = np.stack([a for a, _ in lms])
                lg = np.stack([b for _, b in lms])
                tlmes.append(temporal_landmark_error(lp, lg))
        if tlmes:
            print(f"{face['labels']['tlme']}: {np.mean(tlmes):.4f}")
        else:
            print("tlme: n/a (need >=2 frames per clip; lower inter-space)",
                  file=sys.stderr)
    return 0


def _accumulate(rows, out_i, batch, i, lpips_metric, niqe_fn, args, T,
                face=None, niqe_fit=None):
    import cv2
    from pgtformer_tpu.eval.metrics import calculate_psnr, calculate_ssim
    gt = batch["gt"][i][T // 2]
    lpips_key = ("lpips" if not getattr(lpips_metric, "random_weights",
                                        False) else "lpips(random-vgg)")
    row = {"psnr": calculate_psnr(out_i, gt),
           "ssim": calculate_ssim(out_i, gt),
           lpips_key: lpips_metric(out_i, gt)}
    if niqe_fn is not None:
        row["niqe"] = niqe_fn(out_i)
    if niqe_fit is not None:
        from pgtformer_tpu.eval.niqe import image_niqe_features
        niqe_fit["out"].append(image_niqe_features(out_i))
        niqe_fit["gt"].append(image_niqe_features(gt))
    if face is not None:
        from pgtformer_tpu.eval.landmarks import face_metrics_frame
        fm = face_metrics_frame(out_i, gt, face["detector"],
                                face["embedder"])
        clip = batch["path"][i].rsplit("/", 1)[0]
        face["clip_lms"].setdefault(clip, []).append(
            (fm.pop("_lm_pred"), fm.pop("_lm_gt")))
        row.update({face["labels"].get(k, k): v for k, v in fm.items()})
    rows.append(row)
    if args.save_dir:
        import os
        os.makedirs(args.save_dir, exist_ok=True)
        name = batch["path"][i].replace("/", "_")
        cv2.imwrite(os.path.join(args.save_dir, name),
                    (out_i[..., ::-1] * 255).astype(np.uint8))


if __name__ == "__main__":
    sys.exit(main())
