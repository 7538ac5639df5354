"""Pallas-fused bit-sliced tau-NAF MSM ladder for TPU.

The jnp bit-sliced ladder (ops/xsk233_bs.py) is already VPU-shaped, but
under XLA each fori iteration round-trips its (465, C) loop carries
through HBM.  This kernel keeps the entire 62-window ladder resident in
VMEM: the window table, digit masks and accumulator never leave the
core, so the ladder runs at VPU arithmetic speed instead of HBM
bandwidth.  Field/group code is the SAME traced jnp source
(gf2bs/xsk233_bs) -- one source of truth for the formulas, validated
against the host oracle either way.

Replaces the hot loop of the reference's MSM (reference:
src/curve.rs:113-158) with a fused on-chip program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvpari_tpu.ops import gf2bs as F
from dvpari_tpu.ops import xsk233_bs as bs
from dvpari_tpu.ops.tnaf import N_WINDOWS, TABLE_SIZE

C_TILE = 128  # uint32 columns per grid cell = 4096 points (last block
# dim must be a multiple of the 128-lane tile)


def _ladder_kernel(idx_ref, ng_ref, table_ref, out_ref):
    C = out_ref.shape[-1]

    def body(w, acc):
        acc = bs.frobenius(acc, 4)
        mw = idx_ref[N_WINDOWS - 1 - w]  # (11, C)
        sw = ng_ref[N_WINDOWS - 1 - w]  # (C,)
        t = table_ref[0] & mw[0][None, None]
        for e in range(1, TABLE_SIZE):
            t = t ^ (table_ref[e] & mw[e][None, None])
        t = bs.cneg(t, sw)
        return bs.add(acc, t)

    # narrow multiply stacks + concat-form multiply while tracing this
    # kernel: the ladder must fit VMEM alongside its 4 MB window table
    # (the skew multiply's (30, 240, C) broadcast transient would not).
    # NOTE: module-global toggles are safe only because jax tracing is
    # single-threaded per process; if concurrent tracing ever lands,
    # thread these through mul()'s signature instead.
    prev = bs.MUL_CHUNK
    prev_impl = F.MUL_IMPL
    bs.MUL_CHUNK = 1
    F.MUL_IMPL = "concat"
    try:
        out_ref[...] = jax.lax.fori_loop(
            0, N_WINDOWS, body, bs.infinity((C,))
        )
    finally:
        bs.MUL_CHUNK = prev
        F.MUL_IMPL = prev_impl


def _ladder_tile(idx_t, ng_t, tab_t, interpret):
    """One tile through the fused ladder: gridless pallas_call (single
    invocation -> no block double-buffering, which would put two copies
    of the 4 MB window table in VMEM)."""
    c_tile = idx_t.shape[-1]
    return pl.pallas_call(
        _ladder_kernel,
        out_shape=jax.ShapeDtypeStruct((3, F.M, c_tile), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_t, ng_t, tab_t)


@functools.partial(jax.jit, static_argnames=("c_tile", "interpret"))
def _msm_core(idx_masks, ng_masks, points_bs, c_tile, interpret=False):
    table = bs.tnaf_table(points_bs)  # O(n) prep, XLA
    C = points_bs.shape[-1]
    G = C // c_tile
    if G == 1:
        lad = _ladder_tile(idx_masks, ng_masks, table, interpret)
    else:
        idx_t = idx_masks.reshape(N_WINDOWS, TABLE_SIZE, G, c_tile).transpose(
            2, 0, 1, 3
        )
        ng_t = ng_masks.reshape(N_WINDOWS, G, c_tile).transpose(1, 0, 2)
        tab_t = table.reshape(TABLE_SIZE, 3, F.M, G, c_tile).transpose(
            3, 0, 1, 2, 4
        )
        lad = jax.lax.map(
            lambda t: _ladder_tile(t[0], t[1], t[2], interpret),
            (idx_t, ng_t, tab_t),
        )  # (G, 3, 233, c_tile)
        lad = lad.transpose(1, 2, 0, 3).reshape(3, F.M, C)
    return bs.fold_sum(lad)


@functools.partial(jax.jit, static_argnames=("c_tile", "interpret"))
def _mulgen_core(idx_masks, ng_masks, table_bcast, c_tile, interpret=False):
    """Fixed-base ladder: the (broadcast) window table of ONE base point
    is shared by every tile, and the per-slot ladder results are returned
    un-folded -- batch scalar-mul [k_i]G rather than an MSM."""
    C = idx_masks.shape[-1]
    G = C // c_tile
    if G == 1:
        return _ladder_tile(idx_masks, ng_masks, table_bcast, interpret)
    idx_t = idx_masks.reshape(N_WINDOWS, TABLE_SIZE, G, c_tile).transpose(
        2, 0, 1, 3
    )
    ng_t = ng_masks.reshape(N_WINDOWS, G, c_tile).transpose(1, 0, 2)
    lad = jax.lax.map(
        lambda t: _ladder_tile(t[0], t[1], table_bcast, interpret),
        (idx_t, ng_t),
    )  # (G, 3, 233, c_tile)
    return lad.transpose(1, 2, 0, 3).reshape(3, F.M, C)


def mulgen_packed(
    idx_masks, ng_masks, table_slot, c_tile: int = C_TILE, interpret: bool = False
) -> jnp.ndarray:
    """Fixed-base batch scalar-mul on pre-packed digit masks.

    table_slot: uint32[11, 3, 233, 1] -- the base point's tau-NAF window
    table with the SAME point in all 32 bits of the single column (see
    xsk233.py:_gen_table_planes).  Returns planes (3, 233, ceil(C/c_tile)
    *c_tile) with [k_i]G in every slot (the reference's hottest setup
    loop, xsk233_mulgen_frob: src/curve.rs:129-137, src/srs.rs:131-159).
    """
    C = idx_masks.shape[-1]
    pad = -C % c_tile
    if pad:
        idx_masks = jnp.pad(idx_masks, ((0, 0), (0, 0), (0, pad)))
        ng_masks = jnp.pad(ng_masks, ((0, 0), (0, pad)))
    table_bcast = jnp.broadcast_to(
        jnp.asarray(table_slot), (TABLE_SIZE, 3, F.M, c_tile)
    )
    return _mulgen_core(idx_masks, ng_masks, table_bcast, c_tile, interpret)


def msm_packed(
    idx_masks, ng_masks, points_bs, c_tile: int = C_TILE, interpret: bool = False
) -> jnp.ndarray:
    """Fused MSM on pre-packed bit-sliced operands; pads the column count
    to the tile.  Returns (3, 233) planes with the answer in bit 0."""
    C = points_bs.shape[-1]
    pad = -C % c_tile
    if pad:
        idx_masks = jnp.pad(idx_masks, ((0, 0), (0, 0), (0, pad)))
        ng_masks = jnp.pad(ng_masks, ((0, 0), (0, pad)))
        points_bs = jnp.pad(points_bs, ((0, 0), (0, 0), (0, pad)))
    return _msm_core(idx_masks, ng_masks, points_bs, c_tile, interpret)
