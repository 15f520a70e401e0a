"""Per-fusion roofline attribution of the production serving step.

trace_pipeline.py buckets ops by their trace NAME, but XLA names
conv-rooted fusions `%fusion.N` — so the round-3 "72.7 ms misc
elementwise" bucket silently mixed MXU-bound convolutions with
bandwidth-bound GN/residual passes.  This tool does the attribution
properly:

  1. compile the exact serving step (same graph bench.py measures) and
     take its optimized HLO text;
  2. for every fusion / standalone op, compute
       - FLOPs (convolutions + dots found in the fused computation),
       - HBM bytes (operand + result buffer sizes from the signature);
  3. join with the device-time totals from a kept profiler trace
     (tools/trace_pipeline.py --keep DIR) and print, per op:
       measured ms vs max(FLOP-bound, BW-bound) ms and the efficiency.

The sum of the per-op lower bounds is a speed-of-light estimate for the
whole step under XLA's current fusion choices — the honest ceiling the
VERDICT asked for (match: reference serving loop,
/root/reference/inference.py:21-80).

Bandwidth envelope: tools/exp_elementwise.py measures what this chip
actually streams on these shapes via XLA (~350-460 GB/s, i.e. 45-55% of
the 819 GB/s v5e spec); both spec- and measured-envelope bounds are
printed.

The tool compiles the step, dumps its optimized HLO, and profiles the
SAME compiled executable in-process, so trace span names and HLO op
names share one numbering (fusion.N numbers are not stable across
different jit wrappings).

Usage: python tools/roofline_step.py [--iters 10] [--batch 8]
"""

from __future__ import annotations

import argparse
import collections
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PEAK_FLOPS = 197e12   # v5e bf16 MXU
BW_SPEC = 819e9       # v5e HBM spec
BW_MEAS = 420e9       # measured XLA streaming envelope (exp_elementwise.py)

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
               "f16": 2, "s32": 4, "u32": 4, "f32": 4, "f64": 8, "s64": 8,
               "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum buffer sizes of every shape literal in `text` (handles tuples)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def first_shape(text: str):
    m = SHAPE_RE.search(text)
    if not m:
        return None, None
    dt, dims = m.groups()
    return dt, [int(d) for d in dims.split(",") if d]


NAME_EQ_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = (.+)$")
# opcode: pure lowercase+hyphen word followed by "(" — dtypes (bf16/f32/u8)
# contain digits, tiling annotations T(..)/S(..) are uppercase, so only the
# real opcode matches. "pred" in tuple shapes is followed by "[" not "(".
OPCODE_RE = re.compile(r" ([a-z][a-z\-]*)\(")
COMP_DEF_RE = re.compile(r"^%?([\w.\-]+)\s+\([^=]*\)\s*->")
OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_op_line(line: str):
    """Split an HLO op-definition line into (name, shape_text, opcode,
    operand_rest), handling tuple shapes and hyphenated opcodes."""
    m = NAME_EQ_RE.match(line)
    if not m:
        return None
    name, rest = m.groups()
    om = OPCODE_RE.search(rest)
    if not om:
        return None
    return name, rest[:om.start()], om.group(1), rest[om.end():]


def parse_dims(shape_text: str):
    m = SHAPE_RE.search(shape_text)
    if not m:
        return None, None
    dt, dims = m.groups()
    return dt, [int(d) for d in dims.split(",") if d]


def conv_flops(line: str, out_dims, shape_of) -> int:
    """FLOPs of a convolution op line, resolving the kernel operand's
    shape via the module-wide name->shape map."""
    win_m = re.search(r"window={size=([\dx]+)", line)
    lbl_m = re.search(r"dim_labels=\w+_(\w+)->", line)
    if not (win_m and lbl_m and out_dims):
        return 0
    ops = OPERAND_RE.findall(line.split("convolution(", 1)[1].split("),", 1)[0])
    if len(ops) < 2:
        return 0
    k_dims = shape_of.get(ops[1])
    if not k_dims:
        return 0
    klabels = lbl_m.group(1)  # e.g. "01io", "io01", "o01i"
    cin = k_dims[klabels.index("i")]
    win = [int(w) for w in win_m.group(1).split("x")]
    fgc = re.search(r"feature_group_count=(\d+)", line)
    g = int(fgc.group(1)) if fgc else 1
    return 2 * math.prod(out_dims) * math.prod(win) * cin // g


def dot_flops(line: str, out_dims, shape_of) -> int:
    cdim = re.search(r"lhs_contracting_dims={([\d,]+)}", line)
    if not (cdim and out_dims):
        return 0
    ops = OPERAND_RE.findall(line.split("dot(", 1)[1].split("),", 1)[0])
    if not ops:
        return 0
    lhs_dims = shape_of.get(ops[0])
    if not lhs_dims:
        return 0
    k = math.prod(lhs_dims[int(i)] for i in cdim.group(1).split(","))
    return 2 * math.prod(out_dims) * k


def parse_hlo(hlo: str):
    """Return {op_own_name: (flops, bytes)} for every op that can appear
    as a device trace span: ops in ENTRY and in control-flow computations
    (while bodies etc.), with fusion ops resolving conv/dot FLOPs from
    their called fused computation and bytes from resolved operand
    shapes."""
    lines = hlo.splitlines()

    # Pass 1: module-wide name -> (dims, bytes of output buffer).
    shape_of, bytes_of = {}, {}
    for line in lines:
        p = parse_op_line(line)
        if not p:
            continue
        name, shape_text, _, _ = p
        dt, dims = parse_dims(shape_text)
        if dt is None:
            continue
        shape_of[name] = dims
        bytes_of[name] = shape_bytes(shape_text)
        # parameters of computations also define names via the header —
        # handled below (pass 1b).
    for line in lines:
        cm = COMP_DEF_RE.match(line) or re.match(r"^ENTRY\s+%?([\w.\-]+)\s+\(",
                                                 line)
        if not cm:
            continue
        # header params: "name: TYPE[dims]"
        for pm in re.finditer(r"%?([\w.\-]+):\s*(\w+\[[\d,]*\])", line):
            dt, dims = parse_dims(pm.group(2))
            if dt is not None:
                shape_of.setdefault(pm.group(1), dims)
                bytes_of.setdefault(pm.group(1), shape_bytes(pm.group(2)))

    # Pass 2: per-computation conv/dot FLOP totals (for fusions).
    comp_flops = collections.Counter()
    cur = None
    for line in lines:
        cm = COMP_DEF_RE.match(line)
        if line.startswith("ENTRY"):
            cur = "__entry__"
        elif cm:
            cur = cm.group(1)
        p = parse_op_line(line)
        if not (p and cur):
            continue
        name, shape_text, opcode, _ = p
        _, out_dims = parse_dims(shape_text)
        if opcode == "convolution":
            comp_flops[cur] += conv_flops(line, out_dims, shape_of)
        elif opcode == "dot":
            comp_flops[cur] += dot_flops(line, out_dims, shape_of)

    # Pass 3: build the per-op table over traceable computations.
    results = {}
    cur = None
    fused = False
    for line in lines:
        cm = COMP_DEF_RE.match(line)
        if line.startswith("ENTRY"):
            cur, fused = "__entry__", False
        elif cm:
            cur = cm.group(1)
            fused = "fused_computation" in cur
        p = parse_op_line(line)
        if not (p and cur) or fused:
            continue
        name, shape_text, opcode, rest = p
        _, out_dims = parse_dims(shape_text)
        fl = 0
        if opcode == "convolution":
            fl = conv_flops(line, out_dims, shape_of)
        elif opcode == "dot":
            fl = dot_flops(line, out_dims, shape_of)
        elif opcode == "fusion":
            fcm = re.search(r"calls=%?([\w.\-]+)", line)
            if fcm:
                fl = comp_flops.get(fcm.group(1), 0)
        # bytes: output + resolved operands (operand list ends at "),")
        by = shape_bytes(shape_text)
        oplist = rest.split("),", 1)[0] if "),"  in rest else rest
        for op in OPERAND_RE.findall(oplist):
            by += bytes_of.get(op, 0)
        results[name] = (fl, by, opcode)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--hlo-out", default=None,
                    help="also dump the optimized HLO text here")
    args = ap.parse_args()

    from trace_pipeline import build_step, parse_xplanes

    import tempfile

    import jax
    import numpy as np

    restorer, chunk_dev = build_step(args.batch)
    # Compile the pipeline's own jit instance so the profiled executable
    # and the dumped HLO are literally the same program.
    lowered = restorer._step.lower(restorer.variables, restorer._tail,
                                   chunk_dev)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(hlo)
    per_op = parse_hlo(hlo)

    out, tail = restorer._step(restorer.variables, restorer._tail, chunk_dev)
    np.asarray(out[0, 0, 0, :1])  # warm
    trace_dir = tempfile.mkdtemp(prefix="pgt_roofline_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            out, tail = restorer._step(restorer.variables, tail, chunk_dev)
        np.asarray(out[0, 0, 0, :1])

    sync, _ = parse_xplanes(trace_dir)
    rows = []
    unmatched_ms = 0.0
    for name, ps in sync.items():
        own = name.split(" = ", 1)[0].lstrip("%")
        ms = ps / 1e12 * 1e3 / args.iters
        if own in per_op:
            fl, by, opcode = per_op[own]
        else:
            fl, by, opcode = 0, 0, "?"
            unmatched_ms += ms
        t_flop = fl / PEAK_FLOPS * 1e3
        t_bw_spec = by / BW_SPEC * 1e3
        t_bw_meas = by / BW_MEAS * 1e3
        rows.append((ms, own, fl, by, t_flop, t_bw_spec, t_bw_meas, opcode))

    rows.sort(reverse=True)
    tot_ms = sum(r[0] for r in rows)
    tot_flop = sum(r[4] for r in rows)
    # Custom-calls (Pallas kernels) have no parseable FLOPs — their bound
    # contribution is bytes-only, i.e. the printed SoL is conservative-low
    # for them; their measured time is listed separately.
    cc_ms = sum(r[0] for r in rows if r[7] == "custom-call")
    tot_spec = sum(max(r[4], r[5]) for r in rows)
    tot_meas = sum(max(r[4], r[6]) for r in rows)
    print(f"step total (sync device time): {tot_ms:8.2f} ms")
    print(f"  sum of per-op FLOP bounds:   {tot_flop:8.2f} ms")
    print(f"  speed-of-light @ BW spec:    {tot_spec:8.2f} ms "
          f"(x{tot_ms / max(tot_spec, 1e-9):.2f} headroom)")
    print(f"  speed-of-light @ BW meas:    {tot_meas:8.2f} ms "
          f"(x{tot_ms / max(tot_meas, 1e-9):.2f} headroom)")
    print(f"  Pallas custom-call time:     {cc_ms:8.2f} ms "
          f"(FLOP bounds not parsed — bytes-only)")
    if unmatched_ms:
        print(f"  (unmatched trace spans: {unmatched_ms:.2f} ms)")
    print()
    # Aggregate by opcode class for the summary table.
    by_class = collections.Counter()
    bound_class = collections.Counter()
    for ms, own, fl, by, t_flop, t_spec, t_meas, opcode in rows:
        by_class[opcode] += ms
        bound_class[opcode] += max(t_flop, t_meas)
    print(f"{'opcode':20} {'ms':>8} {'bound(ms)':>10} {'eff':>5}")
    for opc, ms in by_class.most_common():
        b = bound_class[opc]
        print(f"{opc:20} {ms:8.2f} {b:10.2f} {b / ms if ms else 0:5.2f}")
    print()
    hdr = (f"{'ms':>8} {'op':32} {'GF':>8} {'MB':>8} "
           f"{'flop-b':>7} {'bw-b(meas)':>10} {'eff':>5}")
    print(hdr)
    for ms, own, fl, by, t_flop, t_spec, t_meas, opcode in rows[:args.top]:
        bound = max(t_flop, t_meas)
        eff = bound / ms if ms else 0.0
        kind = ("CC " if opcode == "custom-call"
                else "MXU" if t_flop >= t_meas else "BW ")
        print(f"{ms:8.3f} {own:32} {fl / 1e9:8.1f} {by / 1e6:8.1f} "
              f"{t_flop:7.3f} {t_meas:10.3f} {eff:5.2f} {kind}")


if __name__ == "__main__":
    main()
