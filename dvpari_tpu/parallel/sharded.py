"""Sharded MSM and prove-step building blocks.

MSM maps the reference's rayon map+reduce (reference: src/curve.rs:141-158)
onto the mesh: each shard runs the batched ladder over its point slice
and folds locally inside shard_map; the tiny cross-device fold of the
per-shard partials happens outside, where XLA lowers it to an
all-gather + log-depth adds over ICI.

(Implementation note: putting the all_gather + fold inside the
shard_map body triggers a pathological compile in this jaxlib; the
split form compiles in seconds and is also cleaner - the collective
lives at the jit level where GSPMD owns layout.)

The ECFFT/elementwise prover stages are expressed as ordinary jitted
code over domain-sharded arrays: XLA/GSPMD inserts the cross-shard
collective-permutes for butterfly pairs - the idiomatic TPU approach
(annotate shardings, let the compiler place collectives).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dvpari_tpu.ops import xsk233
from dvpari_tpu.parallel.mesh import SHARD_AXIS

# The jitted sharded programs are cached PER MESH (meshes hash by device
# assignment): rebuilding the shard_map/jit closures on every call would
# miss jax's compile cache each time -- three recompiles per sharded
# prove() -- since jit keys on function identity.


@lru_cache(maxsize=None)
def _msm_sharded_fn(mesh):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS), P(None, None, SHARD_AXIS)),
        out_specs=P(None, None, SHARD_AXIS),
        check_rep=False,
    )
    def local(b, p):
        return xsk233.msm(b, p)[..., None]  # one partial per shard

    @jax.jit
    def run(b, p):
        partials = local(b, p)  # (3, 8, ndev)
        return xsk233.reduce_sum(partials)

    return run


def msm_sharded(bits: jnp.ndarray, points: jnp.ndarray, mesh) -> jnp.ndarray:
    """sum_i [k_i] P_i with points/scalars sharded over the mesh.

    bits: uint32[232, n]; points: uint32[3, 8, n]; n divisible by #devices.
    Returns the (3, 8) total.
    """
    return _msm_sharded_fn(mesh)(bits, points)


def msm_bs_sharded(idx_masks, ng_masks, planes, mesh) -> jnp.ndarray:
    """Bit-sliced tau-NAF MSM across the mesh: plane COLUMNS (32 points
    each) shard over the devices, each shard runs the full bit-sliced
    ladder (ops/xsk233_bs.py) over its slice, and the (3, 233, ndev)
    partials fold outside the shard_map (GSPMD all-gather + log-depth
    adds over ICI).  The multi-chip form of the production fused-ladder
    engine; same map+reduce shape as the reference's rayon MSM
    (reference: src/curve.rs:141-158).

    idx_masks uint32[62, 11, C], ng_masks uint32[62, C], planes
    uint32[3, 233, C].  Pads C to a multiple of the device count
    (zero masks select no table entry -> infinity; safe).
    """
    ndev = mesh.devices.size
    C = planes.shape[-1]
    pad = -C % ndev
    if pad:
        idx_masks = jnp.pad(idx_masks, ((0, 0), (0, 0), (0, pad)))
        ng_masks = jnp.pad(ng_masks, ((0, 0), (0, pad)))
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad)))
    return _msm_bs_sharded_fn(mesh)(idx_masks, ng_masks, planes)


@lru_cache(maxsize=None)
def _msm_bs_sharded_fn(mesh):
    import os

    from dvpari_tpu.ops import xsk233_bs as bs

    # On a TPU mesh each shard runs the fused Pallas ladder (the
    # single-chip production engine); elsewhere (CPU test mesh) the XLA
    # bit-sliced core.  DVPARI_SHARD_PALLAS=0 forces XLA on TPU too.
    use_pallas = (
        next(iter(mesh.devices.flat)).platform == "tpu"
        and os.environ.get("DVPARI_SHARD_PALLAS", "1") != "0"
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, SHARD_AXIS),
            P(None, SHARD_AXIS),
            P(None, None, SHARD_AXIS),
        ),
        out_specs=P(None, None, SHARD_AXIS),
        check_rep=False,
    )
    def local(oh, ng, pl):
        if use_pallas:
            from dvpari_tpu.ops import pallas_msm

            return pallas_msm.msm_packed(oh, ng, pl)[..., None]
        return bs._msm_core(oh, ng, pl)[..., None]  # (3, 233, 1) per shard

    @jax.jit
    def run(oh, ng, pl):
        return bs.fold_cols(local(oh, ng, pl))  # (3, 233), answer in bit 0

    return run


def msm_bs_sharded_canon(canon, planes, mesh, chunk_cols: int):
    """Bit-sliced MSM across the mesh with ON-DEVICE recoding: the
    CANONICAL scalars shard over the devices, each shard recodes its
    slice to digit masks on-chip (ops/tnaf_device.py) and runs the
    fused ladder chunk-by-chunk -- the multi-chip MSM moves no recode
    bytes between host and chips at all (multi-chip form of
    ops/xsk233.py:_msm_device_recoded).

    canon int32[20, n] (strong-normalized), planes uint32[3, 233, C]
    with C == ceil32(n).  Returns ((3, 233) planes with the answer in
    bit 0, ok bool[ndev] recode self-checks).
    """
    ndev = mesh.devices.size
    C = planes.shape[-1]
    n = canon.shape[-1]
    cols_per_shard = -(-C // ndev)
    # whole 32-point columns per shard; chunking inside is static
    Cp = cols_per_shard * ndev
    if Cp != C:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Cp - C)))
    if canon.shape[-1] != 32 * Cp:
        canon = jnp.pad(canon, ((0, 0), (0, 32 * Cp - n)))
    ck = min(chunk_cols, cols_per_shard)
    nchunks = -(-cols_per_shard // ck)
    if nchunks * ck != cols_per_shard:  # pad shards to whole chunks
        extra = nchunks * ck * ndev - Cp
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, extra)))
        canon = jnp.pad(canon, ((0, 0), (0, 32 * extra)))
    res, ok = _msm_bs_sharded_canon_fn(mesh, ck, nchunks)(canon, planes)
    return res, ok


@lru_cache(maxsize=None)
def _msm_bs_sharded_canon_fn(mesh, ck: int, nchunks: int):
    import os

    from dvpari_tpu.ops import tnaf_device as tdev
    from dvpari_tpu.ops import xsk233_bs as bs

    use_pallas = (
        next(iter(mesh.devices.flat)).platform == "tpu"
        and os.environ.get("DVPARI_SHARD_PALLAS", "1") != "0"
    )

    def ladder(oh, ng, pl):
        if use_pallas:
            from dvpari_tpu.ops import pallas_msm

            return pallas_msm.msm_packed(oh, ng, pl)
        return bs._msm_core(oh, ng, pl)

    # recode in wide batches (the tau-NAF scan is latency-bound at
    # ladder-chunk width; see ops/xsk233.py:_recode_cols), then ladder
    # ck columns at a time off the batch masks -- all inside one traced
    # program per shard
    rck = max(xsk233._recode_cols() // ck, 1) * ck
    rck = min(rck, nchunks * ck)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS), P(None, None, SHARD_AXIS)),
        out_specs=(P(None, None, SHARD_AXIS), P(SHARD_AXIS)),
        check_rep=False,
    )
    def local(cn, pl):
        partials, oks = [], []
        total = nchunks * ck
        for r in range(0, total, rck):
            w = min(rck, total - r)
            oh, ng, ok = tdev.recode_masks(
                jax.lax.dynamic_slice_in_dim(cn, 32 * r, 32 * w, axis=1)
            )
            oks.append(ok)
            for c0 in range(r, r + w, ck):
                partials.append(
                    ladder(
                        jax.lax.dynamic_slice_in_dim(oh, c0 - r, ck, axis=2),
                        jax.lax.dynamic_slice_in_dim(ng, c0 - r, ck, axis=1),
                        jax.lax.dynamic_slice_in_dim(pl, c0, ck, axis=2),
                    )
                )
        if len(partials) == 1:
            res = partials[0]
        else:
            res = bs._fold_cols_core(jnp.stack(partials, axis=-1))[..., 0]
        return res[..., None], jnp.stack(oks).all()[None]

    @jax.jit
    def run(cn, pl):
        res, ok = local(cn, pl)
        return bs.fold_cols(res), ok

    return run


@lru_cache(maxsize=None)
def _msm_frob_sharded_fn(mesh):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS), P(None, SHARD_AXIS), P(None, None, SHARD_AXIS)),
        out_specs=P(None, None, SHARD_AXIS),
        check_rep=False,
    )
    def local(i, s, p):
        return xsk233.msm_frob(i, s, p)[..., None]

    @jax.jit
    def run(i, s, p):
        return xsk233.reduce_sum(local(i, s, p))

    return run


def msm_frob_sharded(idx, sgn, points, mesh) -> jnp.ndarray:
    """tau-NAF MSM across the mesh (fast path)."""
    return _msm_frob_sharded_fn(mesh)(idx, sgn, points)
