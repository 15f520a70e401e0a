"""Checkpoint / resume via orbax.

Mirrors the BasicSR conventions the reference relies on
(options/release_test_stage_IIII_...yml:134-148: periodic `net_g_<iter>` +
training state, `auto_resume`, EMA weights under `params_ema`), mapped to
orbax PyTree checkpoints:

    <dir>/
      state/<step>/...      # full TrainState (params, EMA, optimizer, rng)
      latest                # text file with the newest step

`export_params_ema` writes an inference-only EMA-params checkpoint, the
analog of the released `params_ema` .pth.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, "state", str(step))

    def save(self, step: int, state: Any):
        path = self._step_dir(step)
        if os.path.exists(path):           # idempotent re-save of a step
            import shutil
            shutil.rmtree(path, ignore_errors=True)
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        with open(os.path.join(self.directory, "latest"), "w") as f:
            f.write(str(step))
        self._gc()

    def _gc(self):
        root = os.path.join(self.directory, "state")
        if not os.path.isdir(root):
            return
        steps = sorted((int(d) for d in os.listdir(root) if d.isdigit()))
        for s in steps[:-self.max_to_keep]:
            import shutil
            shutil.rmtree(os.path.join(root, str(s)), ignore_errors=True)

    def latest_step(self) -> Optional[int]:
        p = os.path.join(self.directory, "latest")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def restore(self, abstract_state: Any, step: Optional[int] = None):
        """Restore into the structure of `abstract_state` (a concrete state
        or a tree of jax.ShapeDtypeStruct)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        restored = self._ckpt.restore(self._step_dir(step), abstract_state)
        return restored, step

    def export_params_ema(self, step: int, ema_params: Any,
                          extra: Optional[dict] = None):
        """Inference checkpoint: EMA params (+ frozen collections)."""
        payload = {"params_ema": ema_params}
        if extra:
            payload.update(extra)
        path = os.path.join(self.directory, f"net_g_{step}")
        self._ckpt.save(path, payload)
        self._ckpt.wait_until_finished()
        return path
