"""Device mesh construction for multi-chip runs.

The reference's only parallelism is rayon's shared-memory thread pool
(SURVEY.md section 2 parallelism table); the TPU-native equivalent is a
1-D `jax.sharding.Mesh` over all chips with domain-indexed vectors
sharded on their trailing axis.  MSM partial sums ride ICI via
all-gather + fold; ECFFT level exchanges are left to GSPMD, which
inserts collective-permutes for the cross-shard butterfly pairs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: "int | None" = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (SHARD_AXIS,))


def spec_last(ndim: int) -> P:
    """PartitionSpec sharding only the last of `ndim` axes."""
    return P(*([None] * (ndim - 1) + [SHARD_AXIS]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
