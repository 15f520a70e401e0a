"""LR schedules: MultiStepLR with linear warmup (the only schedule the
reference recipe uses — options/*.yml `scheduler: MultiStepLR` +
`warmup_iter`)."""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_with_warmup(base_lr: float,
                          milestones: Sequence[int],
                          gamma: float = 0.5,
                          warmup_iter: int = -1) -> optax.Schedule:
    """BasicSR semantics: lr * gamma^(#milestones passed), linearly ramped
    from ~0 over `warmup_iter` steps when warmup_iter > 0."""
    boundaries = {int(m): gamma for m in milestones}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_iter and warmup_iter > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_iter)
        return optax.join_schedules([warm, sched], [warmup_iter])
    return sched


def make_adam(lr_schedule: optax.Schedule, betas=(0.5, 0.9),
              weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam(0.5, 0.9) — the optimizer of every reference stage
    (options/...yml optim_g/optim_d)."""
    if weight_decay:
        return optax.adamw(lr_schedule, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay)
    return optax.adam(lr_schedule, b1=betas[0], b2=betas[1])
