"""Train-state pytrees for the four-stage recipe."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GeneratorState:
    """Generator-side state: params + EMA + optimizer + mutable collections."""
    params: Any
    ema_params: Any
    opt_state: Any
    codebook: Any = None        # EMA codebooks (stage I) / frozen codebooks
    batch_stats: Any = None     # BiSeNet BN running stats (frozen)


@struct.dataclass
class DiscriminatorState:
    params: Any
    opt_state: Any
    batch_stats: Any = None     # PatchGAN BN batch stats


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    g: GeneratorState
    d: Optional[DiscriminatorState]
    rng: jax.Array

    def next_rng(self):
        new_rng, sub = jax.random.split(self.rng)
        return self.replace(rng=new_rng), sub
