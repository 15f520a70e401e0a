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
                          extra: Optional[dict] = None,
                          prefix: str = "net_g"):
        """Inference checkpoint: EMA params (+ frozen collections)."""
        payload = {"params_ema": ema_params}
        if extra:
            payload.update(extra)
        path = os.path.join(self.directory, f"{prefix}_{step}")
        self._ckpt.save(path, payload)
        self._ckpt.wait_until_finished()
        return path


def restore_export_host(path: str):
    """Restore a `net_g_<step>` export (or any orbax PyTree checkpoint) to
    host numpy, deriving the abstract tree from the checkpoint's own
    metadata — works regardless of the devices it was written from."""
    import jax
    from jax.sharding import SingleDeviceSharding

    import numpy as np

    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(os.path.abspath(path))
    tree = getattr(meta, "item_metadata", meta)
    host = SingleDeviceSharding(jax.devices("cpu")[0])
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=host)
        if hasattr(m, "shape") else m, tree,
        is_leaf=lambda m: hasattr(m, "shape"))
    restored = ckptr.restore(os.path.abspath(path), abstract)
    # plain numpy, NOT device-committed jax arrays: a CPU-committed leaf
    # fed into a jitted step would pin the WHOLE compilation to the CPU
    # backend (and Pallas kernels then refuse to lower)
    return jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, restored)


def merge_pretrained(variables, pretrained):
    """Non-strict pretrained load — the BasicSR `strict_load_g: false`
    analog every stage-chain YAML relies on (reference
    options/release_train_stage_II_need_align_version.yml:133-138: stage
    II's PGTFormer partially initializes from the stage-I TDCRQVAE3
    net_g; III from II; IV from III).

    `variables`: freshly initialized model collections ({params, ...}).
    `pretrained`: an export payload ({params_ema, codebook?, ...}).
    Copies every leaf whose flattened path exists in both with matching
    shape; returns (merged, n_loaded, skipped_paths) where skipped_paths
    are pretrained leaves that had no matching destination."""
    from flax import traverse_util

    col_map = {"params_ema": "params", "params": "params"}
    merged = dict(variables)
    n_loaded = 0
    skipped = []
    for src_col, payload in pretrained.items():
        dst_col = col_map.get(src_col, src_col)
        if dst_col not in merged or payload is None:
            skipped.append((src_col,))
            continue
        dst = traverse_util.flatten_dict(dict(merged[dst_col]))
        src = traverse_util.flatten_dict(dict(payload))
        for k, v in src.items():
            if k in dst and tuple(dst[k].shape) == tuple(v.shape):
                dst[k] = v.astype(dst[k].dtype) if hasattr(v, "astype") else v
                n_loaded += 1
            else:
                skipped.append((dst_col,) + k)
        merged[dst_col] = traverse_util.unflatten_dict(dst)
    return merged, n_loaded, skipped
