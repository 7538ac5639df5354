"""Bit-sliced sect233k1 group law + tau-NAF MSM engine for the TPU VPU.

The word-sliced ladder (ops/xsk233.py) is latency-bound: each group add
is dozens of small (8, n) vector ops.  Here a point batch is
`uint32[3, 233, *cols]` -- bit-plane rows, 32 points per uint32 (see
ops/gf2bs.py) -- so every group add is a handful of *full-tile* AND/XOR
passes and the masked-complete case analysis costs one uint32 row per
predicate.  Same formulas as ops/xsk233.py (chord/tangent on
y^2 + xy = x^3 + 1), same tau-NAF window codes (ops/tnaf.py), identical
results; validated against the word-sliced oracle in tests.

Replaces the reference's hot MSM path (reference: src/curve.rs:113-158;
SURVEY.md C1/C3) with a layout the VPU can saturate.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import gf2bs as F
from dvpari_tpu.ops.tnaf import N_WINDOWS, TABLE_SIZE

M = F.M


# ---------------------------------------------------------------------------
# Point helpers: stacked uint32[3, 233, *cols]
# ---------------------------------------------------------------------------

def infinity(cols) -> jnp.ndarray:
    """(0 : 1 : 0) in every slot."""
    return jnp.stack([F.zeros(cols), F.ones(cols), F.zeros(cols)], axis=0)


def point_select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a & mask[None, None]) | (b & ~mask[None, None])


def frobenius(p: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """tau^k: square all three coordinates.  Coordinates are concatenated
    along the LAST (lane) axis so the batched square stays in a wide
    lane-major layout (Pallas/Mosaic friendly; no trailing tiny axis).
    Under a MUL_CHUNK cap (Pallas kernel tracing) the coordinates are
    squared one at a time to bound live VMEM."""
    if MUL_CHUNK is not None and MUL_CHUNK < 3:
        coords = list(p)
        for _ in range(k):
            coords = [F.square(c) for c in coords]
        return jnp.stack(coords, axis=0)
    out = jnp.concatenate([p[0], p[1], p[2]], axis=-1)  # (233, ..., 3C)
    for _ in range(k):
        out = F.square(out)
    C = p.shape[-1]
    return jnp.stack(
        [out[..., :C], out[..., C : 2 * C], out[..., 2 * C :]], axis=0
    )


# Max independent multiplies concatenated into one F.mul call.  Wide
# stacks amortize per-pass overhead but grow live VMEM in the Pallas
# kernel (which sets this to a small value while tracing: the ladder
# kernel must fit the ~16 MB VMEM budget alongside its window table).
MUL_CHUNK: "int | None" = None


def _mulstack(pairs):
    """Batch independent field multiplies by concatenation along the lane
    axis (the 233-pass schoolbook then amortizes its passes over the
    whole stack, and the layout stays lane-major for the VPU)."""
    k = len(pairs)
    if MUL_CHUNK is not None and k > MUL_CHUNK:
        out = []
        for i in range(0, k, MUL_CHUNK):
            out.extend(_mulstack(pairs[i : i + MUL_CHUNK]))
        return out
    A = jnp.concatenate([a for a, _ in pairs], axis=-1)
    B = jnp.concatenate([b for _, b in pairs], axis=-1)
    R = F.mul(A, B)
    C = R.shape[-1] // k
    return [R[..., i * C : (i + 1) * C] for i in range(k)]


def _sqrstack(vals):
    k = len(vals)
    if MUL_CHUNK is not None and k > MUL_CHUNK:
        return [F.square(v) for v in vals]
    R = F.square(jnp.concatenate(vals, axis=-1))
    C = R.shape[-1] // k
    return [R[..., i * C : (i + 1) * C] for i in range(k)]


def double(p: jnp.ndarray) -> jnp.ndarray:
    """Tangent doubling (same formula as ops/xsk233.py:double)."""
    X, Y, Z = p[0], p[1], p[2]
    S, YZ = _mulstack([(X, Z), (Y, Z)])
    X2, S2 = _sqrstack([X, S])
    T = X2 ^ YZ
    TpS = T ^ S
    (X4,) = _sqrstack([X2])
    TT, Z3 = _mulstack([(T, TpS), (S2, S)])
    X3, Y3a, Y3b = _mulstack([(TT, S), (X4, S), (TT, TpS)])
    return jnp.stack([X3, Y3a ^ Y3b, Z3], axis=0)


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Masked-complete addition (same cases as ops/xsk233.py:add);
    predicates are single uint32 rows here."""
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]
    Wm, yz1, yz2, xz1, xz2 = _mulstack(
        [(Z1, Z2), (Y1, Z2), (Y2, Z1), (X1, Z2), (X2, Z1)]
    )
    U = yz1 ^ yz2
    V = xz1 ^ xz2

    V2, U2 = _sqrstack([V, U])
    V3, UW, U2W = _mulstack([(V2, V), (U, Wm), (U2, Wm)])
    UWV, V2Z2, Z3, V3Z2 = _mulstack([(UW, V), (V2, Z2), (V3, Wm), (V3, Z2)])
    N = U2W ^ UWV ^ V3
    X3, X1V2Z2, Y1V3Z2 = _mulstack([(N, V), (X1, V2Z2), (Y1, V3Z2)])
    t1, t2 = _mulstack([(U, X1V2Z2 ^ N), (V, N)])
    Y3 = t1 ^ t2 ^ Y1V3Z2
    generic = jnp.stack([X3, Y3, Z3], axis=0)

    dbl = double(p)

    inf_p = F.is_zero_mask(Z1)
    inf_q = F.is_zero_mask(Z2)
    v_zero = F.is_zero_mask(V)
    u_zero = F.is_zero_mask(U)

    inf_b = infinity(generic.shape[2:])
    res = point_select(v_zero & ~u_zero, inf_b, generic)
    res = point_select(v_zero & u_zero, dbl, res)
    res = point_select(inf_q, jnp.broadcast_to(p, generic.shape), res)
    res = point_select(inf_p, jnp.broadcast_to(q, generic.shape), res)
    return res


def neg(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([p[0], p[0] ^ p[1], p[2]], axis=0)


def cneg(p: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Conditionally negate per element: Y ^= X & mask."""
    return jnp.stack([p[0], p[1] ^ (p[0] & mask[None]), p[2]], axis=0)


# ---------------------------------------------------------------------------
# tau-NAF window table + ladder
# ---------------------------------------------------------------------------

def tnaf_table(p: jnp.ndarray) -> jnp.ndarray:
    """[inf, P, tP, t2P, t3P, P+-t2P, P+-t3P, tP+-t3P]: (11, 3, 233, *cols).

    Same entries/order as ops/xsk233.py:_tnaf_table.
    """
    tp = frobenius(p)
    t2p = frobenius(tp)
    t3p = frobenius(t2p)
    inf = infinity(p.shape[2:])
    # batch the six independent adds along the lane axis
    C = p.shape[-1]
    A = jnp.concatenate([p, p, p, p, tp, tp], axis=-1)
    B = jnp.concatenate(
        [t2p, neg(t2p), t3p, neg(t3p), t3p, neg(t3p)], axis=-1
    )
    S = add(A, B)
    sums = [S[..., i * C : (i + 1) * C] for i in range(6)]
    return jnp.stack([inf, p, tp, t2p, t3p, *sums], axis=0)


def _table_pick(table: jnp.ndarray, masks_w: jnp.ndarray) -> jnp.ndarray:
    """t = XOR_e table[e] & mask[e] -- digit masks are disjoint per bit."""
    t = table[0] & masks_w[0][None, None]
    for e in range(1, TABLE_SIZE):
        t = t ^ (table[e] & masks_w[e][None, None])
    return t


def ladder(idx_masks: jnp.ndarray, neg_masks: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """[k_i]P_i for all packed points.

    idx_masks: uint32[N_WINDOWS, 11, *cols] one-hot digit bitmasks
    neg_masks: uint32[N_WINDOWS, *cols] (bit set -> negate table entry)
    table:     uint32[11, 3, 233, *cols]

    62 iterations of (tau^4 + masked table pick + complete add), MSB
    window first (reference ladder: src/curve.rs:113-126).
    """
    cols = table.shape[3:]

    def body(w, acc):
        acc = frobenius(acc, 4)
        mw = jax.lax.dynamic_index_in_dim(
            idx_masks, N_WINDOWS - 1 - w, axis=0, keepdims=False
        )
        sw = jax.lax.dynamic_index_in_dim(
            neg_masks, N_WINDOWS - 1 - w, axis=0, keepdims=False
        )
        t = cneg(_table_pick(table, mw), sw)
        return add(acc, t)

    return jax.lax.fori_loop(0, N_WINDOWS, body, infinity(cols))


def _fold_cols_core(flat: jnp.ndarray) -> jnp.ndarray:
    """Pairwise group-fold across the last axis: (3, 233, C) -> (3, 233, 1)."""
    C = flat.shape[-1]
    while C > 1:
        half = C // 2
        folded = add(flat[..., :half], flat[..., half : 2 * half])
        if C % 2:
            folded = jnp.concatenate([folded, flat[..., 2 * half :]], axis=-1)
        flat = folded
        C = flat.shape[-1]
    return flat


def fold_sum(p: jnp.ndarray) -> jnp.ndarray:
    """Group-sum every packed point: pairwise column fold + in-word bit
    fold.  Returns (3, 233) planes with the total in bit 0 of column 0."""
    flat = _fold_cols_core(p.reshape(3, M, -1))
    # fold the 32 points inside the remaining uint32 column
    for sh in (16, 8, 4, 2, 1):
        flat = add(flat, flat >> sh)
    return flat[..., 0]


_fold_cols_jit = None


def fold_cols(p: jnp.ndarray) -> jnp.ndarray:
    """Column-only group fold (3, 233, k) -> (3, 233): pairwise adds
    across the last axis, NO in-word bit fold.  Combines per-chunk MSM
    partials (each already bit-folded, answer in bit 0; the other bits
    carry unrelated partial sums and stay slot-parallel garbage)."""
    global _fold_cols_jit
    if _fold_cols_jit is None:
        _fold_cols_jit = jax.jit(lambda flat: _fold_cols_core(flat)[..., 0])
    return _fold_cols_jit(p)


# ---------------------------------------------------------------------------
# Host-side packing: window codes -> bitmasks, points -> planes
# ---------------------------------------------------------------------------

def digit_masks(idx: np.ndarray, sgn: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Window codes int[N_WINDOWS, n] -> (one-hot digit masks
    uint32[N_WINDOWS, 11, n/32], negative masks uint32[N_WINDOWS, n/32]).
    n must be a multiple of 32 (pad idx with 0 = infinity digit)."""
    nw, n = idx.shape
    assert nw == N_WINDOWS and n % 32 == 0, (idx.shape,)
    onehot = (idx[:, None, :] == np.arange(TABLE_SIZE)[None, :, None])
    oh = np.packbits(
        onehot.reshape(nw, TABLE_SIZE, n // 32, 32), axis=3, bitorder="little"
    ).view(np.uint32)[..., 0]
    ng = np.packbits(
        (sgn < 0).reshape(nw, n // 32, 32), axis=2, bitorder="little"
    ).view(np.uint32)[..., 0]
    return oh, ng


def pack_points(points: np.ndarray) -> np.ndarray:
    """Word-layout points uint32[3, 8, n] -> planes uint32[3, 233, ceil32(n)]
    (pads with (0:0:0), which the complete add treats as infinity)."""
    points = np.asarray(points)
    _, _, n = points.shape
    pad = -n % 32
    if pad:
        points = np.concatenate(
            [points, np.zeros((3, 8, pad), np.uint32)], axis=-1
        )
    return np.stack([F.pack_words(points[i]) for i in range(3)], axis=0)


def unpack_points(planes: np.ndarray) -> np.ndarray:
    """Planes uint32[3, 233, C] -> word-layout batch uint32[3, 8, 32*C]
    (inverse of pack_points; vectorized bit transpose, no python loops)."""
    planes = np.asarray(jax.device_get(planes))
    return np.stack([F.unpack_words(planes[i]) for i in range(3)], axis=0)


def extract_point(planes: np.ndarray, slot: int = 0) -> np.ndarray:
    """(3, 233) planes -> word-layout point uint32[3, 8] from bit `slot`."""
    planes = np.asarray(jax.device_get(planes))
    bit = ((planes >> slot) & 1).astype(np.uint8)  # (3, 233)
    out = np.zeros((3, 8), dtype=np.uint32)
    for i in range(M):
        out[:, i // 32] |= bit[:, i].astype(np.uint32) << (i % 32)
    return out


# ---------------------------------------------------------------------------
# MSM entry (host orchestration + one jitted device program)
# ---------------------------------------------------------------------------

_msm_jit = None


def _msm_core(idx_masks, neg_masks, points_bs):
    table = tnaf_table(points_bs)
    return fold_sum(ladder(idx_masks, neg_masks, table))


def msm_packed(idx_masks, neg_masks, points_bs) -> jnp.ndarray:
    """Full bit-sliced MSM on device: table build + ladder + fold.
    Returns (3, 233) planes with the answer in bit 0."""
    global _msm_jit
    if _msm_jit is None:
        _msm_jit = jax.jit(_msm_core)
    return _msm_jit(idx_masks, neg_masks, points_bs)


_mulgen_jit = None


def _mulgen_core(idx_masks, neg_masks, table_slot):
    C = idx_masks.shape[-1]
    tab = jnp.broadcast_to(table_slot, (TABLE_SIZE, 3, M, C))
    return ladder(idx_masks, neg_masks, tab)


def mulgen_packed(idx_masks, neg_masks, table_slot) -> jnp.ndarray:
    """Fixed-base batch scalar-mul (XLA path): one base point's window
    table (uint32[11, 3, 233, 1], same point in all 32 bits) broadcast
    across every slot; per-slot ladder results, no fold.  The Pallas
    fused version is ops/pallas_msm.py:mulgen_packed."""
    global _mulgen_jit
    if _mulgen_jit is None:
        _mulgen_jit = jax.jit(_mulgen_core)
    return _mulgen_jit(idx_masks, neg_masks, table_slot)


def msm_words(idx: np.ndarray, sgn: np.ndarray, points: np.ndarray) -> np.ndarray:
    """tau-NAF MSM from window codes + word-layout points; returns a
    word-layout point uint32[3, 8].  Drop-in check against
    ops/xsk233.py:msm_frob."""
    n = idx.shape[-1]
    pad = -n % 32
    if pad:
        idx = np.concatenate([idx, np.zeros((N_WINDOWS, pad), idx.dtype)], axis=-1)
        sgn = np.concatenate([sgn, np.ones((N_WINDOWS, pad), sgn.dtype)], axis=-1)
    oh, ng = digit_masks(np.asarray(idx), np.asarray(sgn))
    pts = pack_points(np.asarray(jax.device_get(points)))
    res = msm_packed(jnp.asarray(oh), jnp.asarray(ng), jnp.asarray(pts))
    return extract_point(res, 0)
