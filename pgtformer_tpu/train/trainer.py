"""Training loop driver (BasicSR `train.py -opt <yml>` analog).

Wires dataset iterator -> jitted stage step -> logging -> periodic
checkpoint/EMA-export -> validation, with auto-resume
(reference conventions: print_freq 100, save_checkpoint_freq 1e4,
val_freq, auto_resume — options/*.yml `logger:`/`val:` blocks).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterator, Optional

from pgtformer_tpu.utils.logging import get_root_logger, TBLogger
from pgtformer_tpu.utils.checkpoint import CheckpointManager


class Trainer:
    def __init__(self, stage_trainer, exp_dir: str,
                 print_freq: int = 100,
                 save_checkpoint_freq: int = 10000,
                 val_freq: int = 20000,
                 use_tb_logger: bool = True,
                 auto_resume: bool = True):
        self.stage = stage_trainer
        self.exp_dir = exp_dir
        self.print_freq = print_freq
        self.save_freq = save_checkpoint_freq
        self.val_freq = val_freq
        self.logger = get_root_logger()
        self.tb = TBLogger(f"{exp_dir}/tb" if use_tb_logger else None)
        self.ckpt = CheckpointManager(exp_dir)
        self.auto_resume = auto_resume

    def _export(self, step, state):
        """net_g export = EMA params + the frozen collections a consumer
        needs to run the model (codebook for VQ, batch_stats for BN) —
        the BasicSR net_g_<iter>.pth analog that stage chaining and the
        orbax-dir --teacher-ckpt path load."""
        extra = {}
        for col in ("codebook", "batch_stats"):
            v = getattr(state.g, col, None)
            if v is not None:
                extra[col] = v
        self.ckpt.export_params_ema(step, state.g.ema_params, extra=extra)
        # net_d_<iter> analog: the reference chains the discriminator
        # through the stages (stage III loads stage I's net_d, stage IV
        # loads stage III's — options/...stage_III...yml:143,
        # ...stage_IIII...yml:142); without a carried, already-calibrated
        # D a random-init D memorizes small sets, hinge-saturates (zero
        # grads), and G runs away against the frozen D
        d = getattr(state, "d", None)
        if d is not None:
            d_extra = {}
            if getattr(d, "batch_stats", None) is not None:
                d_extra["batch_stats"] = d.batch_stats
            self.ckpt.export_params_ema(step, d.params, extra=d_extra,
                                        prefix="net_d")

    def _append_jsonl(self, rec: dict):
        """Machine-readable training curve (exp_dir/metrics.jsonl)."""
        import json
        import os
        os.makedirs(self.exp_dir, exist_ok=True)
        with open(os.path.join(self.exp_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def fit(self, state, batches: Iterator[Any],
            total_iter: Optional[int] = None,
            val_fn: Optional[Callable[[Any, int], dict]] = None):
        total = total_iter or self.stage.hp.total_iter
        if self.auto_resume:
            restored, step0 = self.ckpt.restore(state)
            if restored is not None:
                state = restored
                self.logger.info(f"auto-resumed from step {step0}")

        step_fn = self.stage.make_step()
        t0 = time.time()
        window_steps = 0
        # host-side step counter: `int(state.step)` would BLOCK on the
        # device every iteration, serializing upload/compute (state.step
        # is a device scalar); sync once here, count on host after
        step = int(state.step)
        for batch in batches:
            if step >= total:
                break
            state, metrics = step_fn(state, batch)
            window_steps += 1
            step += 1

            if step % self.print_freq == 0:
                dt = time.time() - t0
                m = {k: float(v) for k, v in metrics.items()}
                rate = window_steps / dt if dt > 0 else 0.0
                self.logger.info(
                    f"iter {step}/{total}  {rate:.2f} it/s  "
                    + "  ".join(f"{k}:{v:.4f}" for k, v in m.items()))
                self.tb.scalars(step, m)
                self._append_jsonl({"step": step, "it_per_s": round(rate, 3),
                                    **{k: round(v, 5) for k, v in m.items()}})
                t0 = time.time()
                window_steps = 0

            if step % self.save_freq == 0:
                self.ckpt.save(step, state)
                self._export(step, state)
                self.logger.info(f"checkpoint saved at iter {step}")

            if val_fn is not None and step % self.val_freq == 0:
                val_metrics = val_fn(state, step)
                self.logger.info(f"val @ {step}: " + "  ".join(
                    f"{k}:{v:.4f}" for k, v in val_metrics.items()))
                self.tb.scalars(step, {f"val/{k}": v
                                       for k, v in val_metrics.items()})
                self._append_jsonl({"step": step,
                                    **{f"val/{k}": round(float(v), 5)
                                       for k, v in val_metrics.items()}})

        final = int(state.step)
        if final % self.save_freq != 0:   # else the loop already saved it
            self.ckpt.save(final, state)
            self._export(final, state)
        self.tb.flush()
        return state


def epoch_repeat(make_iter: Callable[[], Iterator[Any]]) -> Iterator[Any]:
    """Endlessly cycle a re-creatable dataset iterator."""
    while True:
        yield from make_iter()
