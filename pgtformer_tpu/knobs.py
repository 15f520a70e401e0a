"""Documented performance / numerics knobs.

Every knob that changes *which compiled code* runs (kernel selection,
fused-path opt-ins, determinism trade-offs) is registered here so it is
visible on every CLI's ``--help`` instead of living as a silent
environment variable.  Resolution order, highest priority first:

1. programmatic ``set_knob()`` — what the CLI flags call;
2. the ``PGT_<NAME>`` environment variable (kept as a fallback so
   existing scripts and A/B harnesses keep working);
3. the built-in default.

Numerics-relevant knobs and why they exist:

* ``EXACT_VQ`` — the fused Pallas VQ lookup can break near-ties
  differently from ``jnp.argmin`` (>99.9% agreement asserted by tests),
  so code indices are not bit-reproducible across TPU/CPU backends.
  ``1`` forces the exact-XLA argmin on every backend.
* ``FUSED_TAIL`` — the opt-in fused decoder-tail kernels compute in
  bf16 internally; they only engage under bf16 serving (guarded in
  models/vae.py) but change summation order vs the XLA path.
* ``SW_KERNEL`` / ``SW_RPS`` / ``FUSE_TPATH`` / ``SUBPIXEL`` — pure
  evaluation-plan choices; all variants are parity-tested against each
  other, so these affect performance only (up to float summation
  order).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple


@dataclass(frozen=True)
class Knob:
    name: str                       # PGT_<name> is the env fallback
    default: str
    choices: Optional[Tuple[str, ...]]
    help: str


KNOBS: Dict[str, Knob] = {k.name: k for k in [
    Knob("FUSED_TAIL", "0", ("0", "up", "1"),
         "Opt-in fused Pallas decoder-tail kernels (bf16 only): '1' full "
         "GN+SiLU+conv chain, 'up' upsample-only, '0' XLA (default; wins "
         "in the full pipeline graph — BASELINE.md round-2 A/B)"),
    Knob("FUSE_TPATH", "conv", ("conv", "einsum"),
         "FuseSftBlock temporal-mix evaluation plan: 'conv' folds the "
         "frame mix into one rhs-dilated NHWC conv (default, fastest); "
         "'einsum' contracts (t,c)->(s,d) as a dot. Identical params"),
    Knob("SW_RPS", "", None,
         "Rows-per-stripe for the shifted-window Pallas kernel (int); "
         "empty = auto-pick from geometry/VMEM model"),
    Knob("EXACT_VQ", "0", ("0", "1"),
         "'1' forces the exact-XLA argmin for VQ code lookup on every "
         "backend (bit-reproducible across TPU/CPU; slower on TPU). "
         "Default '0' uses the fused Pallas lookup on TPU, which can "
         "break near-ties differently (>99.9% agreement, tested)"),
    Knob("SW_PAIR", "0", ("0", "1"),
         "Fuse each [no-shift, shift] SW block pair into ONE Pallas "
         "kernel (block-0 carried in VMEM scratch across grid steps; "
         "halves the stripe HBM traffic). Bit-identical outputs; LOSES "
         "~10% in-context (tools/exp_pair_ab.py interleaved A/B: 249 vs "
         "226 ms/step — the carried stripe's VMEM shrinks the working "
         "stripes and serializes what the two-kernel chain pipelines), "
         "so default '0' = one kernel per block"),
    Knob("SW_KERNEL", "5d", ("5d", "tokens"),
         "Shifted-window attention kernel: '5d' streams windows straight "
         "from the [B,T,H,W,C] layout (default), 'tokens' runs the "
         "round-2 kernel on an XLA-partitioned token array"),
    Knob("SUBPIXEL", "dilated", ("dilated", "quad"),
         "Upsample conv3x3(nearest_up2) plan: 'dilated' = one stride-1 "
         "lhs-dilated conv (default), 'quad' = four parity-class 2x2 "
         "convs. Exact up to fp32 summation order"),
]}

_overrides: Dict[str, str] = {}


def _validate(knob: Knob, value: str) -> str:
    value = str(value)
    if knob.choices is not None and value not in knob.choices:
        raise ValueError(
            f"knob {knob.name}: invalid value {value!r} "
            f"(choices: {', '.join(knob.choices)})")
    return value


def get(name: str) -> str:
    knob = KNOBS[name]
    if name in _overrides:
        return _overrides[name]
    env = os.environ.get("PGT_" + name)
    if env is not None:
        return _validate(knob, env)
    return knob.default


def set_knob(name: str, value) -> None:
    _overrides[name] = _validate(KNOBS[name], value)


def reset(name: Optional[str] = None) -> None:
    if name is None:
        _overrides.clear()
    else:
        _overrides.pop(name, None)


def _flag(name: str) -> str:
    return "--" + name.lower().replace("_", "-")


def add_cli_flags(parser) -> None:
    """Add one flag per knob to an argparse parser (default None = keep
    env/default resolution)."""
    g = parser.add_argument_group(
        "performance/numerics knobs",
        "kernel-selection and determinism knobs; each also honors a "
        "PGT_<NAME> environment variable (flag wins). See README.")
    for knob in KNOBS.values():
        g.add_argument(_flag(knob.name), dest=f"knob_{knob.name}",
                       default=None, choices=knob.choices,
                       metavar=None if knob.choices else "VALUE",
                       help=knob.help.replace("%", "%%")
                       + f" [env: PGT_{knob.name}]")


def apply_cli_args(args) -> None:
    for name in KNOBS:
        v = getattr(args, f"knob_{name}", None)
        if v is not None:
            set_knob(name, v)
