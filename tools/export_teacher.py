"""Export a trained stage-I checkpoint as a reference-format teacher .pth
(BasicSR `params_ema` convention) for stage II-IV training — the pipeline
the reference runs across its four stages (SURVEY.md §3.3: stage II+ loads
the stage-I TDCRQVAE3 as frozen `network_gt`).

Usage: python tools/export_teacher.py --exp exp/r3_stage1 [--step 400]
           [--out /tmp/teacher.pth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--out", default="/tmp/teacher.pth")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # pure host-side conversion
    import orbax.checkpoint as ocp
    from pgtformer_tpu.convert.torch_port import save_reference_checkpoint

    step = args.step
    if step is None:
        with open(os.path.join(args.exp, "latest")) as f:
            step = int(f.read().strip())
    ckptr = ocp.StandardCheckpointer()

    def restore_host(path):
        """Restore to host numpy regardless of the devices the checkpoint
        was written from (orbax otherwise replays TPU shardings)."""
        meta = ckptr.metadata(path)
        tree = getattr(meta, "item_metadata", meta)
        from jax.sharding import SingleDeviceSharding
        host = SingleDeviceSharding(jax.devices("cpu")[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=host)
            if hasattr(m, "shape") else m, tree,
            is_leaf=lambda m: hasattr(m, "shape"))
        return ckptr.restore(path, abstract)

    net = restore_host(os.path.abspath(
        os.path.join(args.exp, f"net_g_{step}")))
    state = restore_host(os.path.abspath(
        os.path.join(args.exp, "state", str(step))))
    variables = {"params": net["params_ema"]}
    g = state["g"]
    for col in ("codebook", "batch_stats"):
        if g.get(col) is not None:
            variables[col] = g[col]
    save_reference_checkpoint(variables, args.out, param_key="params_ema")
    print(f"exported step-{step} EMA params + {sorted(variables)} "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
