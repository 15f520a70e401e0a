"""Per-op device-time breakdown of the PRODUCTION serving step.

Runs `pipeline.VideoRestorer._step` (the exact graph bench.py measures)
under jax.profiler, parses the xplane trace, and aggregates device event
time by op, plus coarse buckets (conv fusions / Pallas kernels / copies+
pads+transposes / misc).  Round-2 lesson (BASELINE.md): optimize against
this fused graph, not standalone stage harnesses.

Usage: python tools/trace_pipeline.py [--iters 10] [--batch 8] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(batch):
    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.models.pgtformer import PGTFormer
    from pgtformer_tpu.pipeline import VideoRestorer

    cfg = RELEASE_PGTFORMER
    model = PGTFormer(cfg, dtype=jnp.bfloat16, use_pallas=True)
    res = cfg.vqvae.ddconfig.resolution
    T = cfg.vqvae.tf
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, T, res, res, 3), jnp.float32),
                           w=1.0))
    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(scale=0.02, size=s.shape).astype(s.dtype))
        if np.issubdtype(s.dtype, np.floating)
        else jnp.zeros(s.shape, s.dtype), shapes)
    restorer = VideoRestorer(variables, cfg, w=1.0, batch_windows=batch,
                             dtype=jnp.bfloat16)
    chunk = rng.integers(0, 256, (batch, res, res, 3), dtype=np.uint8)
    restorer.prime(chunk[0])
    return restorer, jnp.asarray(chunk)


BUCKETS = (
    ("pallas_sw_attn", re.compile(
        r"sw_attn|swattn|fused_sw|attn\S*\._fused", re.I)),
    ("pallas_dense_mha", re.compile(r"dense_mha|flash", re.I)),
    ("pallas_vq", re.compile(r"nearest_code|vq_lookup", re.I)),
    ("conv/fusion", re.compile(r"convolution|conv", re.I)),
    ("matmul", re.compile(r"dot|gemm", re.I)),
    ("copy/pad/slice", re.compile(
        r"copy|pad|slice|concatenate|transpose|reshape|bitcast|gather|"
        r"dynamic-update", re.I)),
    ("reduce/norm", re.compile(r"reduce|norm", re.I)),
)


def bucket_of(name: str) -> str:
    # match on "NAME = TYPE opcode" only — operand lists contain other ops'
    # names (%copy.N, %convolution.N, ...) and must not leak into the bucket
    head = name.split("(", 1)[0]
    for label, pat in BUCKETS:
        if pat.search(head):
            return label
    return "misc"


# Classify by the op's OWN name only (the text before " = "): operand lists
# routinely contain %copy-done.N / %copy-start.N references, which must not
# mark a compute fusion as an async copy span.
ASYNC_PAT = re.compile(
    r"^%?[\w.\-]*?(copy-start|copy-done|send|recv|all-gather-start|"
    r"all-reduce-start|collective-permute-start)", re.I)


def own_name(name: str) -> str:
    return name.split(" = ", 1)[0]


def parse_xplanes(log_dir: str, verbose: bool = False):
    """Aggregate device "XLA Ops" event durations (ps) by event name.

    Returns (sync_totals, async_totals): async ops (copy-start prefetches
    etc.) overlap compute, so their spans must not be added to busy time.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    sync = collections.Counter()
    async_ = collections.Counter()
    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {log_dir}"
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name:
                continue
            if verbose:
                print(f"# plane {plane.name}: lines "
                      f"{[l.name for l in plane.lines]}", file=sys.stderr)
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    tgt = async_ if ASYNC_PAT.search(own_name(name)) else sync
                    tgt[name] += ev.duration_ps
    return sync, async_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", default=None,
                    help="keep the trace under this dir")
    args = ap.parse_args()

    import jax

    restorer, chunk_dev = build_step(args.batch)
    tail0 = restorer._tail
    out, tail = restorer._step(restorer.variables, tail0, chunk_dev)
    np.asarray(out[0, 0, 0, :1])  # compile + warm

    log_dir = args.keep or tempfile.mkdtemp(prefix="pgt_trace_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(log_dir)
    tail = tail0
    for _ in range(args.iters):
        out, tail = restorer._step(restorer.variables, tail, chunk_dev)
    np.asarray(out[0, 0, 0, :1])
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    print(f"wall {wall * 1e3 / args.iters:.1f} ms/step "
          f"({args.batch / (wall / args.iters):.2f} fps)")

    sync, async_ = parse_xplanes(log_dir, verbose=True)
    if not sync:
        print("no device events parsed — inspect", log_dir)
        return
    report(sync, async_, args.iters, args.top)
    if not args.keep:
        import shutil
        shutil.rmtree(log_dir, ignore_errors=True)


def report(sync, async_, iters, top):
    per_iter = {k: v / iters / 1e9 for k, v in sync.items()}  # ms
    dev_total = sum(per_iter.values())
    async_total = sum(async_.values()) / iters / 1e9
    print(f"device busy {dev_total:.1f} ms/step "
          f"(+ {async_total:.1f} ms of overlapped async copy spans)")

    buckets = collections.Counter()
    for name, ms in per_iter.items():
        buckets[bucket_of(name)] += ms
    print("\n-- buckets (ms/step, sync ops only) --")
    for label, ms in buckets.most_common():
        print(f"{label:18s} {ms:8.2f}  ({100 * ms / dev_total:4.1f}%)")

    print(f"\n-- top {top} sync ops (ms/step) --")
    for name, ms in sorted(per_iter.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:8.3f}  {name[:120]}")

    per_iter_a = {k: v / iters / 1e9 for k, v in async_.items()}
    print(f"\n-- top {top} async spans (ms/step; may overlap compute) --")
    for name, ms in sorted(per_iter_a.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:8.3f}  {name[:160]}")


if __name__ == "__main__":
    main()
