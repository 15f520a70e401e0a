"""EMA parameter tracking (reference `ema_decay: 0.999`, checkpoints keyed
`params_ema` — options/...stage_III...yml:153, inference_cn.py:126)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay: float = 0.999):
    """new_ema = decay * ema + (1 - decay) * params, leafwise."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def ema_init(params):
    return jax.tree.map(lambda p: p.astype(jnp.float32), params)
