"""Device mesh + sharding helpers.

The reference's only parallelism strategy is DDP data parallelism with NCCL
plus two custom collectives in the codebook EMA (`dist.all_reduce`,
`dist.broadcast` — reference tdcrqvae3_arch.py:157-171; SURVEY.md §2.7).
Here that maps to a 1-D `data` mesh over ICI: train steps run under
`shard_map`, gradients and EMA statistics are `psum`'d over the axis, and
the dead-code restart uses a psum-masked rank-0 selection.

The model (~100M params) fits one chip, so params are replicated; a `model`
axis for sharding the 3072-token transformer is a planned extension, not
needed for parity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis_name,))


def batch_spec() -> P:
    """Batch-sharded over the data axis."""
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def shard_batch(batch, mesh: Mesh):
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
