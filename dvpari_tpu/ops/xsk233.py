"""Batched sect233k1 group law, scalar multiplication and MSM on TPU.

Replaces the reference's xs233-sys C group layer and its naive MSM
(reference: src/curve.rs:63-158; SURVEY.md C1/C3).  Design:

* A point batch is `uint32[3, 8, *batch]`: homogeneous projective
  coordinates (X:Y:Z) with x=X/Z, y=Y/Z over GF(2^233), word axis
  second so batch axes land on TPU lanes.  Z == 0 encodes infinity.
* The group addition is a *masked-complete* formula: the generic-add,
  doubling and infinity cases are all evaluated branch-free and combined
  with lane-wise selects - uniform control flow, as the TPU wants.
  (The reference relies on xs233's constant-time complete formulas; we
  get completeness via masking instead.)
* Scalar multiplication is a fixed 232-iteration left-to-right
  double-and-add over bit planes (uniform, batched).  Frobenius/GLV
  acceleration (xsk233_mul_frob) is an optimization the reference
  exposes; results are identical, so it can land later without changing
  any caller (SURVEY.md section 2, C1 note).
* MSM: batched per-point scalar mul + log-depth pairwise tree reduction
  - the same algorithm as the reference's rayon map+reduce
  (reference: src/curve.rs:141-158), but lane-parallel.  Pippenger
  bucketing slots in behind the same signature.

Formulas (derived from the affine chord/tangent law for
y^2 + xy = x^3 + 1, verified against the host oracle in tests):

  add (x1 != x2), with W = Z1 Z2, U = Y1 Z2 + Y2 Z1, V = X1 Z2 + X2 Z1:
      N  = U^2 W + U V W + V^3
      X3 = N V ,  Z3 = V^3 W ,
      Y3 = U (X1 V^2 Z2 + N) + V N + Y1 V^3 Z2
  double, with S = X Z, T = X^2 + Y Z:
      X3 = T (T + S) S ,  Y3 = X^5 Z + T (T + S)^2 ,  Z3 = S^3
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import gf2
from dvpari_tpu.utils import xsk233_host as host

NBITS = 232  # scalars are canonical Fr elements < p < 2^232


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------

def infinity(batch_shape=()) -> jnp.ndarray:
    # built with concat of traced zeros/ones (no captured constants, no
    # scatter) so it is usable inside Pallas kernels
    zw = jnp.zeros((1, *batch_shape), dtype=jnp.uint32)
    ow = jnp.ones((1, *batch_shape), dtype=jnp.uint32)
    X = jnp.concatenate([zw] * gf2.NWORD, axis=0)
    Y = jnp.concatenate([ow] + [zw] * (gf2.NWORD - 1), axis=0)
    return jnp.stack([X, Y, X], axis=0)  # (0 : 1 : 0)


def generator(batch_shape=()) -> jnp.ndarray:
    return from_affine_int([(host.GX, host.GY)] if batch_shape else (host.GX, host.GY))


def from_affine_int(points) -> jnp.ndarray:
    """(x, y) int pair, list of pairs, or None (infinity) -> device batch."""
    if points is None or isinstance(points, tuple):
        pts = [points]
        single = True
    else:
        pts = list(points)
        single = False
    n = len(pts)
    out = np.zeros((3, gf2.NWORD, n), dtype=np.uint32)
    for j, p in enumerate(pts):
        if p is None:
            out[1, 0, j] = 1
        else:
            out[0, :, j] = gf2.from_int(p[0])
            out[1, :, j] = gf2.from_int(p[1])
            out[2, 0, j] = 1
    if single:
        return jnp.asarray(out[:, :, 0])
    return jnp.asarray(out)


def to_affine_int(p):
    """Device batch -> list of (x, y) tuples / None (host side)."""
    arr = jax.device_get(p)
    X, Y, Z = arr[0], arr[1], arr[2]
    squeeze = X.ndim == 1
    if squeeze:
        X, Y, Z = X[:, None], Y[:, None], Z[:, None]
    xs, ys, zs = gf2.to_int(X), gf2.to_int(Y), gf2.to_int(Z)
    from dvpari_tpu.utils import gf2_host as gh

    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = gh.inv_int(z)
            out.append((gh.mul_int(x, zi), gh.mul_int(y, zi)))
    return out[0] if squeeze else out


def is_infinity(p: jnp.ndarray) -> jnp.ndarray:
    return gf2.is_zero(p[2])


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lane select over the batch shape (True -> a)."""
    return jnp.where(mask[None, None, ...], a, b)


def neg(p: jnp.ndarray) -> jnp.ndarray:
    """-(x, y) = (x, x + y):  (X : X + Y : Z)."""
    return jnp.stack([p[0], p[0] ^ p[1], p[2]], axis=0)


# ---------------------------------------------------------------------------
# Group law
# ---------------------------------------------------------------------------
#
# The formulas are evaluated in *stacked stages*: all independent field
# multiplies of a stage run as ONE batched gf2.mul over an extra trailing
# axis.  On TPU the ladder is latency-bound by op count, so 6 fat
# invocations beat ~25 thin ones (~2.5x fewer dispatches).

def _mulstack(pairs):
    A = jnp.stack([a for a, _ in pairs], axis=-1)
    B = jnp.stack([b for _, b in pairs], axis=-1)
    R = gf2.mul(A, B)
    return [R[..., i] for i in range(len(pairs))]


def _sqrstack(vals):
    R = gf2.square(jnp.stack(vals, axis=-1))
    return [R[..., i] for i in range(len(vals))]


def double(p: jnp.ndarray) -> jnp.ndarray:
    X, Y, Z = p[0], p[1], p[2]
    S, YZ = _mulstack([(X, Z), (Y, Z)])
    X2, S2 = _sqrstack([X, S])
    T = X2 ^ YZ
    TpS = T ^ S
    (X4,) = _sqrstack([X2])
    TT, Z3 = _mulstack([(T, TpS), (S2, S)])
    # X^5 Z = X^4 * (X Z) = X4 * S
    X3, Y3a, Y3b = _mulstack([(TT, S), (X4, S), (TT, TpS)])
    return jnp.stack([X3, Y3a ^ Y3b, Z3], axis=0)


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Masked-complete addition; handles inf, doubling and inverse cases."""
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]
    Wm, yz1, yz2, xz1, xz2 = _mulstack(
        [(Z1, Z2), (Y1, Z2), (Y2, Z1), (X1, Z2), (X2, Z1)]
    )
    U = yz1 ^ yz2
    V = xz1 ^ xz2

    V2, U2 = _sqrstack([V, U])
    V3, UW, U2W = _mulstack([(V2, V), (U, Wm), (U2, Wm)])
    UWV, V2Z2, Z3, V3Z2 = _mulstack(
        [(UW, V), (V2, Z2), (V3, Wm), (V3, Z2)]
    )
    N = U2W ^ UWV ^ V3
    X3, X1V2Z2, Y1V3Z2 = _mulstack([(N, V), (X1, V2Z2), (Y1, V3Z2)])
    t1, t2 = _mulstack([(U, X1V2Z2 ^ N), (V, N)])
    Y3 = t1 ^ t2 ^ Y1V3Z2
    generic = jnp.stack([X3, Y3, Z3], axis=0)

    dbl = double(p)

    inf_p = gf2.is_zero(Z1)
    inf_q = gf2.is_zero(Z2)
    v_zero = gf2.is_zero(V)
    u_zero = gf2.is_zero(U)

    inf_b = jnp.broadcast_to(
        infinity().reshape(3, gf2.NWORD, *(1,) * (generic.ndim - 2)), generic.shape
    )
    res = jnp.where((v_zero & ~u_zero)[None, None, ...], inf_b, generic)
    res = jnp.where((v_zero & u_zero)[None, None, ...], dbl, res)
    res = jnp.where(inf_q[None, None, ...], jnp.broadcast_to(p, generic.shape), res)
    res = jnp.where(inf_p[None, None, ...], jnp.broadcast_to(q, generic.shape), res)
    return res


def eq(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Projective equality by cross-multiplication (reference:
    xsk233_equals semantics, src/curve.rs:69-76)."""
    both_inf = is_infinity(p) & is_infinity(q)
    one_inf = is_infinity(p) ^ is_infinity(q)
    x_eq = gf2.eq(gf2.mul(p[0], q[2]), gf2.mul(q[0], p[2]))
    y_eq = gf2.eq(gf2.mul(p[1], q[2]), gf2.mul(q[1], p[2]))
    return both_inf | (~one_inf & x_eq & y_eq)


# ---------------------------------------------------------------------------
# Scalar multiplication / MSM
# ---------------------------------------------------------------------------

def scalars_to_bits(ints) -> np.ndarray:
    """Canonical scalar ints -> uint32[NBITS, n] bit planes (LSB first)."""
    ints = list(ints)
    out = np.zeros((NBITS, len(ints)), dtype=np.uint32)
    for j, v in enumerate(ints):
        v = int(v)
        for i in range(NBITS):
            out[i, j] = (v >> i) & 1
    return out


def fr_limbs_to_bits(limbs: jnp.ndarray) -> jnp.ndarray:
    """Device-side: canonical Fr limbs int32[20, *b] -> uint32[232, *b] bits."""
    from dvpari_tpu.ops import fr

    v = fr.strong_normalize(limbs).astype(jnp.uint32)
    planes = []
    for i in range(NBITS):
        limb, bit = divmod(i, fr.LIMB_BITS)
        planes.append((v[limb] >> bit) & 1)
    return jnp.stack(planes, axis=0)


def scalar_mul(bits: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """[k]P for bit planes uint32[NBITS, *batch] (LSB first), batched."""

    def body(i, acc):
        acc = double(acc)
        bit = bits[NBITS - 1 - i]
        return select(bit == 1, add(acc, p), acc)

    batch = jnp.broadcast_shapes(bits.shape[1:], p.shape[2:])
    acc0 = jnp.broadcast_to(
        infinity().reshape(3, gf2.NWORD, *(1,) * len(batch)),
        (3, gf2.NWORD, *batch),
    )
    p = jnp.broadcast_to(p, acc0.shape)
    return jax.lax.fori_loop(0, NBITS, body, acc0)


def scalar_mul_gen(bits: jnp.ndarray) -> jnp.ndarray:
    """[k]G (reference: point_scalar_mul_gen, src/curve.rs:129-137)."""
    g = generator()
    gb = jnp.broadcast_to(g[..., None].reshape(3, gf2.NWORD, *(1,) * (bits.ndim - 1)),
                          (3, gf2.NWORD, *bits.shape[1:]))
    return scalar_mul(bits, gb)


def frobenius(p: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """tau^k(P) = (X^2^k : Y^2^k : Z^2^k) - the Koblitz endomorphism.

    Squaring is linear in GF(2^233), so this costs ~1/50 of a double;
    it is the engine behind the tau-NAF ladder (reference capability:
    xsk233_mul_frob, src/curve.rs:113-126).  All three coordinates are
    squared in one batched call per step (word axis moved to front).
    """
    out = jnp.moveaxis(p, 0, -1)  # (8, *batch, 3)
    for _ in range(k):
        out = gf2.square(out)
    return jnp.moveaxis(out, -1, 0)


def _tnaf_table(p: jnp.ndarray) -> jnp.ndarray:
    """The 11-entry window table [inf, P, tP, t2P, t3P, P+-t2P, P+-t3P,
    tP+-t3P] as one stacked array (11, 3, 8, *batch)."""
    tp = frobenius(p)
    t2p = frobenius(tp)
    t3p = frobenius(t2p)
    inf = jnp.broadcast_to(
        infinity().reshape(3, gf2.NWORD, *(1,) * (p.ndim - 2)), p.shape
    )
    return jnp.stack(
        [
            inf,
            p,
            tp,
            t2p,
            t3p,
            add(p, t2p),
            add(p, neg(t2p)),
            add(p, t3p),
            add(p, neg(t3p)),
            add(tp, t3p),
            add(tp, neg(t3p)),
        ],
        axis=0,
    )


def scalar_mul_frob(idx: jnp.ndarray, sgn: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """[k]P from width-4 tau-NAF window codes (see ops.tnaf.recode_scalars).

    idx/sgn: int32[N_WINDOWS, *batch]; p: (3, 8, *batch).
    62 iterations of (4 frobenius + table gather + signed complete add).
    """
    from dvpari_tpu.ops.tnaf import N_WINDOWS

    batch = jnp.broadcast_shapes(idx.shape[1:], p.shape[2:])
    p = jnp.broadcast_to(p, (3, gf2.NWORD, *batch))
    table = _tnaf_table(p)  # (11, 3, 8, *batch)

    def body(w, acc):
        acc = frobenius(acc, 4)
        i = jax.lax.dynamic_index_in_dim(idx, N_WINDOWS - 1 - w, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(sgn, N_WINDOWS - 1 - w, keepdims=False)
        gather_idx = jnp.broadcast_to(i, (1, 3, gf2.NWORD, *batch))
        t = jnp.take_along_axis(table, gather_idx, axis=0)[0]
        t = jnp.where((s == -1)[None, None, ...], neg(t), t)
        return add(acc, t)

    acc0 = jnp.broadcast_to(
        infinity().reshape(3, gf2.NWORD, *(1,) * len(batch)),
        (3, gf2.NWORD, *batch),
    )
    return jax.lax.fori_loop(0, N_WINDOWS, body, acc0)


def msm_frob(idx: jnp.ndarray, sgn: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Frobenius-accelerated MSM (lane ladder + pairwise fold)."""
    return reduce_sum(scalar_mul_frob(idx, sgn, points))


# Jitted entry points: the ladder contains nested lax loops which must not
# be dispatched as standalone eager scans (slow, and this jaxlib's XLA:CPU
# crashes sporadically under eager compile storms).
_msm_frob_jit = None
_smul_frob_jit = None


def msm_frob_jit(idx, sgn, points):
    global _msm_frob_jit
    if _msm_frob_jit is None:
        _msm_frob_jit = jax.jit(msm_frob)
    return _msm_frob_jit(idx, sgn, points)


def scalar_mul_frob_jit(idx, sgn, points):
    global _smul_frob_jit
    if _smul_frob_jit is None:
        _smul_frob_jit = jax.jit(scalar_mul_frob)
    return _smul_frob_jit(idx, sgn, points)


def recode_ints(ks) -> "tuple[jnp.ndarray, jnp.ndarray]":
    from dvpari_tpu.ops.tnaf import recode_scalars

    idx, sgn = recode_scalars(ks)
    return jnp.asarray(idx), jnp.asarray(sgn)


_strongnorm_jit = None


def recode_limbs(scalars: jnp.ndarray) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """Device Fr limb scalars -> tau-NAF window codes via the native bulk
    recoder (device canonicalization + one host round trip, no python-int
    loops)."""
    global _strongnorm_jit
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops.tnaf import recode_scalars_bulk

    if _strongnorm_jit is None:
        _strongnorm_jit = jax.jit(fr.strong_normalize)
    canon = np.asarray(jax.device_get(_strongnorm_jit(scalars)))
    idx, sgn = recode_scalars_bulk(canon)
    return jnp.asarray(idx), jnp.asarray(sgn)


# Minimum size for the bit-sliced fused-ladder path (one Pallas tile =
# 4096 points); smaller MSMs stay on the word-sliced lane ladder.
_BS_MIN_N = 4096


def _msm_chunk_cols() -> int:
    """Pipelining granularity for the bit-sliced MSM, in plane columns
    (32 points each).  Host tau-NAF recoding of chunk i+1 overlaps the
    device ladder of chunk i via async dispatch, so neither the CPU nor
    the TPU ever waits for the other on large MSMs."""
    import os

    return int(os.environ.get("DVPARI_MSM_CHUNK_COLS", "512"))


def _recode_cols() -> int:
    """Columns per on-device recode batch (32 points each).  The 248-step
    tau-NAF scan is latency-bound at ladder-chunk width (each step is ~15
    small VPU ops whose dispatch overhead dominates below ~1 MB
    operands), so recoding runs in batches much wider than the ladder
    chunk and the resulting masks are dynamic-sliced per ladder call.
    Masks cost 45 B/pt of HBM per batch -- 4096 cols = 131k points =
    ~12 MB, negligible."""
    import os

    return int(os.environ.get("DVPARI_RECODE_COLS", "4096"))


def _recode_impl() -> str:
    """"device" (default): tau-NAF recoding runs on-chip as a jitted XLA
    program (ops/tnaf_device.py) for BOTH the variable-base MSM and the
    fixed-base mulgen fan-out.  "host": the native OpenMP recoder with
    chunk-pipelined transfers (escape hatch; contention-sensitive on the
    4-core host)."""
    import os

    return os.environ.get("DVPARI_RECODE", "device")


# Compile-cost structure: slice offsets are traced dynamic_slice
# arguments, NOT static bounds (eager per-offset slicing would compile
# one program per chunk offset, ~45 s each on the tunneled backend) --
# AND the cheap slicing is its own tiny program, keyed by the full array
# shape, while the expensive fused recode / Pallas-ladder programs see
# only fixed chunk-width inputs and are keyed by (rck) / (rck, ck).  One
# ~570 s ladder compile then serves every MSM (g_m, g_q, g_k) at every
# problem size; only the seconds-scale slice programs are per-shape.
_slice_canon_jits: dict = {}
_slice_plane_jits: dict = {}
_recode_chunk_jits: dict = {}
_ladder_chunk_jits: dict = {}


def _msm_device_recoded(canon_dev, planes, on_device, C, ck):
    """Fully device-resident chunked MSM: recode the canonical scalars
    to digit masks on-chip in WIDE batches (the tau-NAF scan is
    latency-bound at ladder width, see _recode_cols), then dynamic-slice
    the batch masks per ladder chunk and run the fused Pallas ladder;
    fold partials on-chip.  Returns (result planes, recode self-check
    bools to assert after the final fetch).

    Exactly one compiled recode program (width rck) and one ladder
    program (width ck) serve every chunk: all offsets are dynamic_slice
    ARGUMENTS.  The canonical scalars are zero-padded up to a whole
    number of recode batches (zero scalars recode to infinity); the
    ladder loop still clips to the real column count, so the recode
    tail waste is bounded by one batch of scan time and never costs
    ladder time."""
    from dvpari_tpu.ops import pallas_msm
    from dvpari_tpu.ops import tnaf_device as tdev
    from dvpari_tpu.ops import xsk233_bs as bs

    Cp = -(-C // ck) * ck  # pad to whole ladder chunks
    rck = max(_recode_cols() // ck, 1) * ck  # recode batch width
    # rck is NOT clamped to Cp: a fixed recode width keeps the compile
    # key set at exactly one (rck) + one (rck, ck) for EVERY problem
    # size (a clamp made n=65537 produce rck=2560 and n=65536 rck=2048
    # -- two extra ~minutes-scale tunnel compiles for nothing).  Tail
    # waste is bounded by one recode batch of scan time (~0.45 s at
    # 4096 cols); the ladder loop still clips to Cp.
    Cpr = -(-Cp // rck) * rck  # recode-batch padding (canon only)
    if canon_dev.shape[-1] != 32 * Cpr:  # zero scalars recode to infinity
        canon_dev = jnp.pad(
            canon_dev, ((0, 0), (0, 32 * Cpr - canon_dev.shape[-1]))
        )
    if Cp != C:  # zero planes are infinity points under the complete add
        planes = (
            jnp.pad(planes, ((0, 0), (0, 0), (0, Cp - C)))
            if on_device
            else np.pad(planes, ((0, 0), (0, 0), (0, Cp - C)))
        )
    if not on_device:
        planes = jnp.asarray(planes)  # single upload; sliced on device

    sk = (canon_dev.shape, rck)
    if sk not in _slice_canon_jits:
        _slice_canon_jits[sk] = jax.jit(
            lambda canon, i: jax.lax.dynamic_slice_in_dim(
                canon, i, 32 * rck, axis=1
            )
        )
    pk = (planes.shape, ck)
    if pk not in _slice_plane_jits:
        _slice_plane_jits[pk] = jax.jit(
            lambda pl, c0: jax.lax.dynamic_slice_in_dim(pl, c0, ck, axis=2)
        )
    if rck not in _recode_chunk_jits:
        _recode_chunk_jits[rck] = jax.jit(tdev.recode_masks)
    lk = (rck, ck)
    if lk not in _ladder_chunk_jits:
        _ladder_chunk_jits[lk] = jax.jit(
            lambda oh, ng, plc, m0: pallas_msm.msm_packed(
                jax.lax.dynamic_slice_in_dim(oh, m0, ck, axis=2),
                jax.lax.dynamic_slice_in_dim(ng, m0, ck, axis=1),
                plc,
            )
        )
    slice_canon = _slice_canon_jits[sk]
    slice_plane = _slice_plane_jits[pk]
    recode_fn = _recode_chunk_jits[rck]
    ladder_fn = _ladder_chunk_jits[lk]

    partials, oks = [], []
    for r0 in range(0, Cp, rck):
        oh, ng, ok = recode_fn(slice_canon(canon_dev, 32 * r0))
        oks.append(ok)
        for c0 in range(r0, min(r0 + rck, Cp), ck):
            partials.append(
                ladder_fn(oh, ng, slice_plane(planes, c0), c0 - r0)
            )
    if len(partials) == 1:
        return partials[0], oks
    return bs.fold_cols(jnp.stack(partials, axis=-1)), oks


def _msm_limbs_bitsliced(
    scalars: jnp.ndarray, points: jnp.ndarray, planes=None
) -> jnp.ndarray:
    """Bit-sliced Pallas MSM: recode-to-masks + plane packing + fused
    on-chip ladder (ops/pallas_msm.py).  ~9x the word-sliced device
    throughput at 2^14.  `planes` (value or zero-arg callable) supplies
    a pre-packed bit-plane layout, e.g. the .planes.npz SRS sidecar
    (storage/artifacts.py:read_point_vec_planes).

    Default path recodes ON-DEVICE (ops/tnaf_device.py): with the planes
    cached device-resident, a prove's MSMs move zero O(n) bytes over the
    host link.  DVPARI_RECODE=host restores the native OpenMP recoder
    with chunk-pipelined transfers (each chunk's masks recode on host
    while the previous chunk's ladder runs on device)."""
    global _strongnorm_jit
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops import xsk233_bs as bs
    from dvpari_tpu.ops import pallas_msm
    from dvpari_tpu.ops.tnaf import recode_masks_bulk

    if _strongnorm_jit is None:
        _strongnorm_jit = jax.jit(fr.strong_normalize)
    canon_dev = _strongnorm_jit(scalars)
    if callable(planes):
        planes = planes()
    if planes is None:
        if callable(points):
            points = points()
        planes = bs.pack_points(np.asarray(jax.device_get(points)))
    # device-resident planes (e.g. the cached SRS sidecar upload,
    # storage/artifacts.py:read_point_vec_planes(device=True)) are
    # sliced lazily on device -- no per-prove H2D of the whole vector;
    # host arrays keep the old per-chunk upload behavior
    on_device = isinstance(planes, jax.Array)
    if not on_device:
        planes = np.asarray(planes)
    C = planes.shape[-1]
    n = int(scalars.shape[-1])
    want_c = -(-n // 32)
    assert C == want_c, (
        f"bit-plane sidecar has {C} columns for {n} scalars "
        f"(expected {want_c}): stale .planes.npz?"
    )
    ck = _msm_chunk_cols()
    if _recode_impl() == "device":
        res, oks = _msm_device_recoded(
            canon_dev, planes, on_device, C, min(C, ck)
        )
        out = jnp.asarray(bs.extract_point(res, 0))
        # extract_point fetched the result, so the ok bools are computed;
        # asserting after the fetch keeps the pipeline fully async
        assert all(bool(np.asarray(jax.device_get(o))) for o in oks), (
            "device tau-NAF recode self-check failed"
        )
        return out
    if C <= ck:
        canon = np.asarray(jax.device_get(canon_dev))
        oh, ng = recode_masks_bulk(canon)
        res = pallas_msm.msm_packed(
            jnp.asarray(oh), jnp.asarray(ng), jnp.asarray(planes)
        )
        return jnp.asarray(bs.extract_point(res, 0))
    # Pre-enqueue per-chunk canonical-scalar slices: the small slice ops
    # run at the head of the device queue, so each in-loop fetch is a
    # pure D2H copy of a READY buffer that overlaps the previous chunk's
    # ladder -- no O(n) synchronous fetch in front of the pipeline (at
    # 2^23 the full canonical vector is ~640 MB).
    bounds = [(32 * c0, min(32 * (c0 + ck), n)) for c0 in range(0, C, ck)]
    canon_slices = [canon_dev[:, a:b] for a, b in bounds]
    partials = []
    for (a, b), sl in zip(bounds, canon_slices):
        oh, ng = recode_masks_bulk(np.asarray(jax.device_get(sl)))
        c0, c1 = a // 32, a // 32 + -(-(b - a) // 32)
        pl = planes[:, :, c0:c1] if on_device else jnp.asarray(planes[:, :, c0:c1])
        # async dispatch: returns at enqueue, device crunches this
        # chunk while the next one recodes on host
        partials.append(
            pallas_msm.msm_packed(jnp.asarray(oh), jnp.asarray(ng), pl)
        )
    res = bs.fold_cols(jnp.stack(partials, axis=-1))
    return jnp.asarray(bs.extract_point(res, 0))


def _msm_limbs_bs_sharded(scalars, points, planes, mesh) -> jnp.ndarray:
    """Bit-sliced MSM across the device mesh.  Default: canonical
    scalars shard over the devices and each shard recodes ON-CHIP then
    runs the fused engine (parallel/sharded.py:msm_bs_sharded_canon) --
    no recode bytes cross the host link.  DVPARI_RECODE=host keeps the
    native OpenMP recode + mask sharding (msm_bs_sharded).  Either way
    the per-shard partials fold over ICI -- the reference's rayon
    map+reduce (src/curve.rs:141-158) spread over chips."""
    global _strongnorm_jit
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops import xsk233_bs as bs
    from dvpari_tpu.ops.tnaf import recode_masks_bulk
    from dvpari_tpu.parallel.sharded import msm_bs_sharded, msm_bs_sharded_canon

    if _strongnorm_jit is None:
        _strongnorm_jit = jax.jit(fr.strong_normalize)
    canon_dev = _strongnorm_jit(scalars)
    if callable(planes):
        planes = planes()
    if planes is None:
        if callable(points):
            points = points()
        planes = bs.pack_points(np.asarray(jax.device_get(points)))
    n = int(scalars.shape[-1])
    assert planes.shape[-1] == -(-n // 32), (
        f"bit-plane sidecar has {planes.shape[-1]} columns for {n} scalars"
    )
    if _recode_impl() == "device":
        res, ok = msm_bs_sharded_canon(
            canon_dev, jnp.asarray(planes), mesh, _msm_chunk_cols()
        )
        out = jnp.asarray(bs.extract_point(res, 0))
        assert bool(np.asarray(jax.device_get(ok)).all()), (
            "device tau-NAF recode self-check failed (sharded)"
        )
        return out
    canon = np.asarray(jax.device_get(canon_dev))
    planes = np.asarray(planes)
    oh, ng = recode_masks_bulk(canon)
    res = msm_bs_sharded(
        jnp.asarray(oh), jnp.asarray(ng), jnp.asarray(planes), mesh
    )
    return jnp.asarray(bs.extract_point(res, 0))


def msm_limbs(
    scalars: jnp.ndarray, points: jnp.ndarray, mesh=None, planes=None
) -> jnp.ndarray:
    """MSM over device Fr limb scalars via the tau-NAF fast path.

    Recoding runs in the native C++ backend (bulk, OpenMP), mirroring the
    split in the reference where recoding lives inside the C library
    (reference: src/curve.rs:113-137).  Large single-chip MSMs dispatch
    to the bit-sliced fused Pallas ladder; with a mesh, points and window
    codes are sharded over the devices and the per-shard partials fold
    over ICI (the reference's rayon map+reduce, src/curve.rs:141-158,
    spread over chips instead of threads).

    `points` may be a zero-arg callable (lazy loader): when the
    bit-sliced path consumes a pre-packed `planes` sidecar, the word
    layout is never materialized at all -- at production scale that
    skips gigabytes of redundant SRS loading per MSM."""
    import os

    n = int(scalars.shape[-1])
    impl = os.environ.get("DVPARI_MSM_IMPL", "auto")
    bs_eligible = (
        impl in ("auto", "bs")
        and (impl == "bs" or n >= _BS_MIN_N)
        # DVPARI_MSM_IMPL=bs forces the path even on CPU (tests stub the
        # Pallas entry); "auto" never takes it off-TPU
        and (impl == "bs" or jax.default_backend() != "cpu")
    )
    if mesh is None and bs_eligible:
        return _msm_limbs_bitsliced(scalars, points, planes)
    if mesh is not None and bs_eligible:
        return _msm_limbs_bs_sharded(scalars, points, planes, mesh)
    if callable(points):
        points = points()
    idx, sgn = recode_limbs(scalars)
    if mesh is None:
        return msm_frob_jit(idx, sgn, points)
    from dvpari_tpu.parallel.sharded import msm_frob_sharded

    ndev = mesh.devices.size
    n = idx.shape[-1]
    pad = (-n) % ndev
    if pad:
        from dvpari_tpu.ops.tnaf import N_WINDOWS

        idx = jnp.concatenate(
            [idx, jnp.zeros((N_WINDOWS, pad), idx.dtype)], axis=-1
        )
        sgn = jnp.concatenate(
            [sgn, jnp.ones((N_WINDOWS, pad), sgn.dtype)], axis=-1
        )
        inf = jnp.broadcast_to(
            infinity().reshape(3, gf2.NWORD, 1), (3, gf2.NWORD, pad)
        )
        points = jnp.concatenate([points, inf], axis=-1)
    return msm_frob_sharded(idx, sgn, points, mesh)


def scalar_mul_gen_ints(ks) -> jnp.ndarray:
    """[k_i]G batched over the tau-NAF ladder (reference capability:
    xsk233_mulgen_frob, src/curve.rs:129-137)."""
    idx, sgn = recode_ints(ks)
    g = jnp.broadcast_to(
        generator().reshape(3, gf2.NWORD, 1), (3, gf2.NWORD, idx.shape[-1])
    )
    return scalar_mul_frob_jit(idx, sgn, g)


_gen_table_planes_cache = None
_tnaf_table_jit = None


def _gen_table_planes() -> np.ndarray:
    """G's tau-NAF window table in bit-plane layout, uint32[11, 3, 233, 1]
    with G's bits replicated into all 32 slots of the single column --
    the compile-time-constant table of the fixed-base ladder (the
    precomputed-table role of the reference's xsk233_mulgen_frob,
    src/curve.rs:129-137)."""
    global _gen_table_planes_cache, _tnaf_table_jit
    if _gen_table_planes_cache is None:
        from dvpari_tpu.ops import xsk233_bs as bs

        if _tnaf_table_jit is None:
            _tnaf_table_jit = jax.jit(_tnaf_table)
        g = generator().reshape(3, gf2.NWORD, 1)
        tab = np.asarray(jax.device_get(_tnaf_table_jit(g)))  # (11, 3, 8, 1)
        _gen_table_planes_cache = np.stack(
            [
                bs.pack_points(np.broadcast_to(tab[e], (3, gf2.NWORD, 32)))
                for e in range(tab.shape[0])
            ],
            axis=0,
        )
    return _gen_table_planes_cache


def _mulgen_bs_host(scalars: jnp.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Bit-sliced fixed-base fan-out, fully pipelined, host outputs.

    Three-way overlap per chunk: fetch chunk i's canonical scalars (a
    ready buffer -- the slices are pre-enqueued), recode + dispatch its
    ladder (async), then drain chunk i-1's result and unpack it in
    numpy while the device crunches chunk i.  No stage ever holds an
    O(n) synchronous transfer.  Returns (proj uint32[3, 8, n],
    planes uint32[3, 233, ceil32(n)])."""
    global _strongnorm_jit
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops import pallas_msm
    from dvpari_tpu.ops import xsk233_bs as bs
    from dvpari_tpu.ops.tnaf import recode_masks_bulk

    if _strongnorm_jit is None:
        _strongnorm_jit = jax.jit(fr.strong_normalize)
    n = int(scalars.shape[-1])
    canon_dev = _strongnorm_jit(scalars)
    table = jnp.asarray(_gen_table_planes())
    ck = _msm_chunk_cols()
    C = -(-n // 32)
    bounds = [(s0, min(s0 + 32 * ck, n)) for s0 in range(0, n, 32 * ck)]
    canon_slices = [canon_dev[:, a:b] for a, b in bounds]
    proj = np.zeros((3, gf2.NWORD, n), dtype=np.uint32)
    planes = np.zeros((3, bs.M, C), dtype=np.uint32)

    def drain(out, a, b):
        cols = -(-(b - a) // 32)
        pl = np.asarray(jax.device_get(out))[..., :cols]
        planes[:, :, a // 32 : a // 32 + cols] = pl
        proj[..., a:b] = bs.unpack_points(pl)[..., : b - a]

    pending = None
    for (a, b), sl in zip(bounds, canon_slices):
        oh, ng = recode_masks_bulk(np.asarray(jax.device_get(sl)))
        out = pallas_msm.mulgen_packed(jnp.asarray(oh), jnp.asarray(ng), table)
        if pending is not None:
            drain(*pending)
        pending = (out, a, b)
    if pending is not None:
        drain(*pending)
    return proj, planes


_mulgen_chunk_jits: dict = {}


def _mulgen_device_programs(n: int, canon_shape):
    """Jit wrappers for the device-recode fan-out at batch size n:
    (slice_canon, recode_fn, ladder_fn, ck, rck, Cp, Cpr).  Keyed
    exactly like _msm_device_recoded's (shared _recode_chunk_jits --
    the MSM's compiled recode program serves the fan-out too); factored
    out so warm_fanout_jobs can compile the same programs concurrently
    at setup start instead of paying them serially inside g_m."""
    from dvpari_tpu.ops import pallas_msm
    from dvpari_tpu.ops import tnaf_device as tdev

    C = -(-n // 32)
    ck = _msm_chunk_cols()
    Cp = -(-C // ck) * ck
    rck = max(_recode_cols() // ck, 1) * ck  # unclamped: one key set
    Cpr = -(-Cp // rck) * rck
    sk = ((canon_shape[0], 32 * Cpr), rck)
    if sk not in _slice_canon_jits:
        _slice_canon_jits[sk] = jax.jit(
            lambda c, i: jax.lax.dynamic_slice_in_dim(c, i, 32 * rck, axis=1)
        )
    if rck not in _recode_chunk_jits:
        _recode_chunk_jits[rck] = jax.jit(tdev.recode_masks)
    lk = (rck, ck)
    if lk not in _mulgen_chunk_jits:
        _mulgen_chunk_jits[lk] = jax.jit(
            lambda oh, ng, tab, m0: pallas_msm.mulgen_packed(
                jax.lax.dynamic_slice_in_dim(oh, m0, ck, axis=2),
                jax.lax.dynamic_slice_in_dim(ng, m0, ck, axis=1),
                tab,
            )
        )
    return (
        _slice_canon_jits[sk],
        _recode_chunk_jits[rck],
        _mulgen_chunk_jits[lk],
        ck,
        rck,
        Cp,
        Cpr,
    )


def warm_fanout_jobs(n: int) -> "list":
    """(name, thunk) compile jobs for the fan-out program universe at
    batch size n -- fed to warm_protocol_programs' thread pool so the
    recode + mulgen-ladder compiles overlap the setup's tree/vanishing
    phases.  Zero operands are valid executions (zero scalars recode to
    infinity; the ladder's complete formulas accept it)."""
    from dvpari_tpu.ops import fr

    if not (_mulgen_use_bs(n) and _recode_impl() == "device"):
        return []

    def _run():
        _, recode_fn, ladder_fn, ck, rck, _, _ = _mulgen_device_programs(
            n, (fr.NLIMB, n)
        )
        oh, ng, _ = recode_fn(jnp.zeros((fr.NLIMB, 32 * rck), jnp.int32))
        ladder_fn(oh, ng, jnp.asarray(_gen_table_planes()), 0)

    return [("mulgen_fanout", _run)]


def _mulgen_bs_device(scalars: jnp.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Bit-sliced fixed-base fan-out with ON-DEVICE tau-NAF recoding.

    The host-recode pipeline (_mulgen_bs_host) bottoms out on the 4-core
    native recoder plus two O(n) tunnel transfers per chunk (canonical
    scalars D2H ~80 B/pt, digit masks H2D ~93 B/pt): measured ~3.3k
    pts/s on the m=2^18 g_m fan-out (JOURNAL r5 ladder).  Here the
    scalars never leave the chip: the SAME wide-batch recode program the
    variable-base MSM compiles (_recode_chunk_jits, ops/tnaf_device.py)
    feeds a fixed-chunk-width mulgen ladder whose offsets are
    dynamic_slice ARGUMENTS -- one compiled ladder serves every fan-out
    at every size -- and the only host traffic is the result planes
    (~87 B/pt), drained one chunk behind dispatch so the fetch overlaps
    the next chunk's ladder.  Recode self-checks are asserted after the
    final fetch.  (reference: the xsk233_mulgen_frob fan-out loop,
    src/srs.rs:131-159 -- its hottest setup phase)"""
    global _strongnorm_jit
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops import xsk233_bs as bs

    if _strongnorm_jit is None:
        _strongnorm_jit = jax.jit(fr.strong_normalize)
    n = int(scalars.shape[-1])
    C = -(-n // 32)
    slice_canon, recode_fn, ladder_fn, ck, rck, Cp, Cpr = (
        _mulgen_device_programs(n, scalars.shape)
    )
    canon = _strongnorm_jit(scalars)
    if canon.shape[-1] != 32 * Cpr:  # zero scalars recode to infinity
        canon = jnp.pad(canon, ((0, 0), (0, 32 * Cpr - canon.shape[-1])))
    table = jnp.asarray(_gen_table_planes())

    proj = np.zeros((3, gf2.NWORD, n), dtype=np.uint32)
    planes = np.zeros((3, bs.M, C), dtype=np.uint32)

    def drain(out, c0):
        cols = min(ck, C - c0)
        if cols <= 0:
            return
        pl = np.asarray(jax.device_get(out))[..., :cols]
        planes[:, :, c0 : c0 + cols] = pl
        lo, hi = 32 * c0, min(32 * (c0 + cols), n)
        proj[..., lo:hi] = bs.unpack_points(pl)[..., : hi - lo]

    oks, pending = [], None
    for r0 in range(0, Cp, rck):
        oh, ng, ok = recode_fn(slice_canon(canon, 32 * r0))
        oks.append(ok)
        for c0 in range(r0, min(r0 + rck, Cp), ck):
            out = ladder_fn(oh, ng, table, c0 - r0)
            if pending is not None:
                drain(*pending)
            pending = (out, c0)
    if pending is not None:
        drain(*pending)
    if not all(bool(jax.device_get(ok)) for ok in oks):
        raise AssertionError("on-device tau-NAF recode self-check failed")
    return proj, planes


def _mulgen_use_bs(n: int) -> bool:
    import os

    impl = os.environ.get("DVPARI_MSM_IMPL", "auto")
    return (
        impl in ("auto", "bs")
        and (impl == "bs" or n >= _BS_MIN_N)
        and (impl == "bs" or jax.default_backend() != "cpu")
    )


def mulgen_limbs_host(scalars: jnp.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Fixed-base fan-out with HOST outputs (proj words, bit planes) --
    what the setup's SRS writer consumes (storage/artifacts.py), without
    bouncing the multi-GB vectors through the device and back."""
    from dvpari_tpu.ops import xsk233_bs as bs

    n = int(scalars.shape[-1])
    if _mulgen_use_bs(n):
        if _recode_impl() == "device":
            return _mulgen_bs_device(scalars)
        return _mulgen_bs_host(scalars)
    idx, sgn = recode_limbs(scalars)
    g = jnp.broadcast_to(generator().reshape(3, gf2.NWORD, 1), (3, gf2.NWORD, n))
    proj = np.asarray(jax.device_get(scalar_mul_frob_jit(idx, sgn, g)))
    return proj, bs.pack_points(proj)


def mulgen_limbs(scalars: jnp.ndarray) -> jnp.ndarray:
    """Fixed-base batch scalar-mul [s_i]G over device Fr limb scalars,
    returning word-layout points (3, 8, n).

    This is the reference's hottest setup loop (~5m sequential
    xsk233_mulgen_frob calls, src/srs.rs:131-159): here the scalars are
    bulk-recoded to digit masks natively and the bit-sliced ladder runs
    them 32-per-uint32 against G's constant window table -- large
    batches take the fused Pallas ladder on TPU, small ones (and CPU
    tests) the word-sliced lane ladder."""
    n = int(scalars.shape[-1])
    if _mulgen_use_bs(n):
        if _recode_impl() == "device":
            proj, _ = _mulgen_bs_device(scalars)
        else:
            proj, _ = _mulgen_bs_host(scalars)
        return jnp.asarray(proj)
    idx, sgn = recode_limbs(scalars)
    g = jnp.broadcast_to(generator().reshape(3, gf2.NWORD, 1), (3, gf2.NWORD, n))
    return scalar_mul_frob_jit(idx, sgn, g)


def reduce_sum(points: jnp.ndarray) -> jnp.ndarray:
    """Group-sum over the last batch axis by log-depth pairwise folding."""
    n = points.shape[-1]
    while n > 1:
        half = n // 2
        a = points[..., :half]
        b = points[..., half : 2 * half]
        folded = add(a, b)
        if n % 2:
            folded = jnp.concatenate([folded, points[..., 2 * half : n]], axis=-1)
        points = folded
        n = points.shape[-1]
    return points[..., 0]


def msm(bits: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Multi-scalar multiplication: sum_i [k_i] P_i.

    bits: uint32[NBITS, n]; points: uint32[3, 8, n].
    Algorithm mirrors the reference's parallel mul+reduce
    (reference: src/curve.rs:141-158) with lanes instead of threads.
    """
    return reduce_sum(scalar_mul(bits, points))
