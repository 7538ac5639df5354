"""Sharded MSM and prove-step building blocks.

MSM maps the reference's rayon map+reduce (reference: src/curve.rs:141-158)
onto the mesh: each shard runs the batched double-and-add ladder over its
point slice, folds locally, then partial sums are all-gathered over ICI
and folded to a replicated result (shard_map + all_gather).

The ECFFT/elementwise prover stages are expressed as ordinary jitted
code over domain-sharded arrays: XLA/GSPMD inserts the cross-shard
collective-permutes for butterfly pairs - the idiomatic TPU approach
(annotate shardings, let the compiler place collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dvpari_tpu.ops import xsk233
from dvpari_tpu.parallel.mesh import SHARD_AXIS


def msm_sharded(bits: jnp.ndarray, points: jnp.ndarray, mesh) -> jnp.ndarray:
    """sum_i [k_i] P_i with points/scalars sharded over the mesh.

    bits: uint32[232, n]; points: uint32[3, 8, n]; n divisible by #devices.
    Returns a replicated (3, 8) point.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS), P(None, None, SHARD_AXIS)),
        out_specs=P(),
        check_rep=False,
    )
    def run(bits_l, pts_l):
        local = xsk233.msm(bits_l, pts_l)  # (3, 8) partial sum
        gathered = jax.lax.all_gather(local, SHARD_AXIS)  # (ndev, 3, 8)
        stacked = jnp.moveaxis(gathered, 0, -1)  # (3, 8, ndev)
        return xsk233.reduce_sum(stacked)

    return run(bits, points)
