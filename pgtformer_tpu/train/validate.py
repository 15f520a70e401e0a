"""Training-time validation (the reference's `val:` blocks —
options/release_train_stage_I_need_align_version.yml:148-175: every
`val_freq` iters, run the EMA generator over the val split, compute
PSNR/SSIM(/LPIPS/NIQE) and save restored images).

`make_val_fn` returns a `val_fn(state, step) -> dict` suitable for
Trainer.fit.  Stage I validates autoencoder reconstruction of GT clips;
stages II–IV validate full LQ->restored middle frames.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def make_val_fn(stage_trainer, dataset, stage: str,
                max_samples: int = 8,
                save_dir: Optional[str] = None,
                lpips_metric: Optional[Callable] = None,
                niqe_fn: Optional[Callable] = None,
                w: float = 1.0,
                use_ema: bool = True) -> Callable:
    """Build a validation callback over a VFHQ dataset.

    The forward runs the EMA params (BasicSR validates net_g_ema when
    ema_decay > 0) on one sample at a time (static shapes, no recompiles).
    """
    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.eval.metrics import calculate_psnr, calculate_ssim

    model = stage_trainer.model
    T = 2 * dataset.r + 1

    if stage == "I":
        @jax.jit
        def fwd(variables, clip):
            out, _, _ = model.apply(variables, clip)
            return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
    else:
        @jax.jit
        def fwd(variables, clip):
            out, _, _ = model.apply(variables, clip, w=w)
            out = out.reshape(1, T, *out.shape[1:])[:, T // 2]
            return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    idxs = list(range(0, len(dataset),
                      max(1, len(dataset) // max(1, max_samples))))
    idxs = idxs[:max_samples]

    def val_fn(state, step: int) -> dict:
        params = state.g.ema_params if use_ema else state.g.params
        variables = {"params": params}
        if getattr(state.g, "codebook", None) is not None:
            variables["codebook"] = state.g.codebook
        if getattr(state.g, "batch_stats", None) is not None:
            variables["batch_stats"] = state.g.batch_stats

        rows = []
        for i in idxs:
            sample = dataset[i]
            if stage == "I":
                inp = jnp.asarray(sample["gt"][None])
                target = sample["gt"]          # [T, H, W, 3]
                out = np.asarray(fwd(variables, inp))  # [T, H, W, 3] flat
                out = out.reshape(target.shape)
                pairs = [(out[t], target[t]) for t in range(T)]
            else:
                inp = jnp.asarray(sample["lq"][None])
                target = sample["gt"][T // 2]
                out = np.asarray(fwd(variables, inp))[0]
                pairs = [(out, target)]

            row = {"psnr": float(np.mean([calculate_psnr(a, b)
                                          for a, b in pairs])),
                   "ssim": float(np.mean([calculate_ssim(a, b)
                                          for a, b in pairs]))}
            if lpips_metric is not None:
                row["lpips"] = float(np.mean([lpips_metric(a, b)
                                              for a, b in pairs]))
            if niqe_fn is not None:
                row["niqe"] = float(np.mean([niqe_fn(a) for a, _ in pairs]))
            rows.append(row)

            if save_dir is not None:
                import cv2
                d = os.path.join(save_dir, f"iter_{step}")
                os.makedirs(d, exist_ok=True)
                img = pairs[0][0]
                name = sample["path"].replace("/", "_")
                cv2.imwrite(os.path.join(d, name),
                            (np.clip(img[..., ::-1], 0, 1)
                             * 255).astype(np.uint8))

        return {k: float(np.mean([r[k] for r in rows]))
                for k in rows[0].keys()}

    return val_fn
