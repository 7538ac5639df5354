"""Pallas-fused tau-NAF scalar-multiplication ladder for TPU (EXPERIMENTAL).

STATUS: correct (validated on-chip against the host oracle) but
currently ~200x SLOWER than the XLA path - the straight-line reuse of
the jnp field code inside the kernel produces terrible Mosaic layouts
(word-axis concatenations land on sublanes and force whole-tile copies
per clmul iteration).  NOT wired into any production path; kept as the
starting point for a proper kernel with a transposed layout (words on
lanes / bit-planes, clmul as in-register shift network).  See
JOURNAL.md for the round-2 plan.

The XLA path (ops/xsk233.py) issues ~10^5 small vector ops per ladder;
on-chip per-op overhead makes small/medium MSMs latency-bound.  This
kernel runs the ENTIRE 62-window ladder inside one Pallas program: the
11-entry window table lives in VMEM, window digits select entries via
one-hot masking (no per-lane gathers), and the masked-complete group
addition runs on values that never leave VMEM/vregs.

Field/group code is shared with ops/gf2.py / ops/xsk233.py - those
functions are pure jnp and trace directly inside the kernel, so there is
a single source of truth for the formulas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvpari_tpu.ops import gf2, xsk233
from dvpari_tpu.ops.tnaf import N_WINDOWS, TABLE_SIZE

DEFAULT_TILE = 512


def _ladder_kernel(idx_ref, sgn_ref, table_ref, out_ref):
    table = table_ref[...]  # (11, 3, 8, T)
    T = table.shape[-1]

    acc0 = jnp.broadcast_to(
        xsk233.infinity().reshape(3, gf2.NWORD, 1), (3, gf2.NWORD, T)
    )

    def body(w, acc):
        acc = xsk233.frobenius(acc, 4)
        i = idx_ref[N_WINDOWS - 1 - w, :]  # (T,)
        s = sgn_ref[N_WINDOWS - 1 - w, :]
        # one-hot select of the window point (lane-uniform control flow)
        t = jnp.zeros((3, gf2.NWORD, T), dtype=jnp.uint32)
        for e in range(TABLE_SIZE):
            mask = (i == e)[None, None, :]
            t = jnp.where(mask, table[e], t)
        t = jnp.where((s == -1)[None, None, :], xsk233.neg(t), t)
        return xsk233.add(acc, t)

    out_ref[...] = jax.lax.fori_loop(0, N_WINDOWS, body, acc0)


@functools.partial(jax.jit, static_argnames=("tile",))
def scalar_mul_frob_pallas(
    idx: jnp.ndarray, sgn: jnp.ndarray, p: jnp.ndarray, tile: int = DEFAULT_TILE
) -> jnp.ndarray:
    """[k]P via the fused ladder kernel.

    idx/sgn: int32[N_WINDOWS, n]; p: uint32[3, 8, n]; n % tile == 0
    (callers pad; see msm_frob_pallas).
    """
    n = idx.shape[-1]
    assert n % tile == 0, (n, tile)
    table = xsk233._tnaf_table(p)  # (11, 3, 8, n) - built by XLA once

    grid = (n // tile,)
    return pl.pallas_call(
        _ladder_kernel,
        out_shape=jax.ShapeDtypeStruct((3, gf2.NWORD, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_WINDOWS, tile), lambda g: (0, g)),
            pl.BlockSpec((N_WINDOWS, tile), lambda g: (0, g)),
            pl.BlockSpec(
                (TABLE_SIZE, 3, gf2.NWORD, tile), lambda g: (0, 0, 0, g)
            ),
        ],
        out_specs=pl.BlockSpec((3, gf2.NWORD, tile), lambda g: (0, 0, g)),
    )(idx, sgn, table)


def msm_frob_pallas(idx, sgn, points, tile: int = DEFAULT_TILE):
    """Frobenius MSM through the fused ladder; pads the batch to the tile."""
    n = idx.shape[-1]
    pad = (-n) % tile
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))  # digit 0 windows -> [0]P = inf
        sgn = jnp.pad(sgn, ((0, 0), (0, pad)), constant_values=1)
        inf = jnp.broadcast_to(
            xsk233.infinity().reshape(3, gf2.NWORD, 1), (3, gf2.NWORD, pad)
        )
        points = jnp.concatenate([points, inf], axis=-1)
    return xsk233.reduce_sum(scalar_mul_frob_pallas(idx, sgn, points, tile=tile))
