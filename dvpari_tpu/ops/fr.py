"""Fr: the sect233k1 scalar field (232-bit prime), as batched TPU limb arithmetic.

Re-architects the reference's arkworks Montgomery backend
(reference: src/curve.rs:16-22, `Fp256<MontBackend<FqConfig, 4>>`) as a
vectorized lazy-reduction representation designed for the TPU VPU:

* An element batch is an `int32[20, *batch]` array: 20 *signed* limbs of
  12 bits, limb axis FIRST so the batch axes land on TPU lanes.
* Limbs are loose (|limb| <= LOOSE_BOUND = 10000) rather than canonical.
  A 20-term schoolbook product column is then bounded by 20 * 10000^2
  < 2^31, so a whole multiply accumulates exactly in int32 lanes with no
  carry handling inside the convolution - ideal for the VPU's 32-bit
  ALUs.  The ~2.4x slack over the canonical 4096 keeps local carry
  passes convergent, and signed limbs make subtraction a plain `a - b`.
* Reduction exploits the Koblitz structure of the order: 4p = 2^233 + c
  with c ~ 2^127, hence 2^240 = -128c (mod p) where D = 128c is only
  ~134 bits = 12 limbs.  High limbs fold back by *subtracting* D-scaled
  carries - cheap, branch-free, and exact in int32.

Values are canonicalized (strong_normalize / host to_int) only at
comparison and serialization boundaries, mirroring how the reference
only leaves Montgomery form at I/O (reference: src/curve.rs:162-182,
src/io_utils.rs:123-174).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# The sect233k1 prime-subgroup order (reference: src/curve.rs:17).
P = 3450873173395281893717377931138512760570940988862252126328087024741343

LIMB_BITS = 12
NLIMB = 20  # 20 * 12 = 240 bits >= 232
BASE = 1 << LIMB_BITS
MASK = BASE - 1
LOOSE_BOUND = 10000  # ops keep |limb| <= ~8300; mul is exact up to 10000

# 2^240 = -D (mod p) with D = 128 * (4p - 2^233), ~134 bits -> 12 limbs.
D_FOLD = (4 * P - (1 << 233)) << 7
assert 0 < D_FOLD and (-(1 << 240)) % P == D_FOLD
D_NLIMB = 12
assert D_FOLD < (1 << (LIMB_BITS * D_NLIMB))


def _int_to_limbs(x: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = x & MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limbs"
    return out


D_LIMBS = _int_to_limbs(D_FOLD, D_NLIMB)
P_LIMBS = _int_to_limbs(P, NLIMB)

# Canonicalization offset: 2048p as 21 limbs with limbs 0..19 pushed into
# [9000, 2^15) so that adding it absorbs any loose negative limbs.
_LADDER_WIDTH = NLIMB + 1


def _canon_offset() -> np.ndarray:
    limbs = [int(v) for v in _int_to_limbs(2048 * P, _LADDER_WIDTH)]
    for i in range(_LADDER_WIDTH - 2, -1, -1):
        while limbs[i] < 9000:
            limbs[i] += BASE
            limbs[i + 1] -= 1
    assert all(9000 <= v < (1 << 15) for v in limbs[:-1]) and limbs[-1] >= 0
    assert sum(v << (LIMB_BITS * i) for i, v in enumerate(limbs)) == 2048 * P
    return np.array(limbs, dtype=np.int32)


CANON_OFFSET = _canon_offset()


# ---------------------------------------------------------------------------
# Host-side conversions
# ---------------------------------------------------------------------------

def from_int(values) -> np.ndarray:
    """Python int / iterable of ints -> int32[20, *batch] canonical limbs."""
    if isinstance(values, (int, np.integer)):
        return _int_to_limbs(int(values) % P, NLIMB)
    values = list(values)
    out = np.zeros((NLIMB, len(values)), dtype=np.int32)
    for j, v in enumerate(values):
        out[:, j] = _int_to_limbs(int(v) % P, NLIMB)
    return out


def to_int(limbs):
    """int32[20] or int32[20, N] loose limbs -> canonical int(s) mod P."""
    arr = np.asarray(jax.device_get(limbs), dtype=np.int64)
    if arr.ndim == 1:
        return sum(int(arr[i]) << (LIMB_BITS * i) for i in range(NLIMB)) % P
    flat = arr.reshape(NLIMB, -1)
    return [
        sum(int(flat[i, j]) << (LIMB_BITS * i) for i in range(NLIMB)) % P
        for j in range(flat.shape[1])
    ]


def limbs_from_be_bytes(raw: np.ndarray) -> np.ndarray:
    """(n, nbytes) big-endian records -> UNREDUCED wide limbs int32[W, n].

    Vectorized (no python-int loops); feed the result through
    weak_normalize/strong_normalize on device to reduce mod P.
    """
    raw = np.asarray(raw, dtype=np.uint8)
    n, nbytes = raw.shape
    bits = np.unpackbits(raw[:, ::-1], axis=1, bitorder="little")  # LSB first
    width = -(-(8 * nbytes) // LIMB_BITS)
    pad = width * LIMB_BITS - 8 * nbytes
    bits = np.pad(bits, [(0, 0), (0, pad)])
    weights = (1 << np.arange(LIMB_BITS)).astype(np.int32)
    limbs = bits.reshape(n, width, LIMB_BITS).astype(np.int32) @ weights
    return limbs.T.copy()  # (width, n)


def limbs_to_le_bytes(canonical: np.ndarray, width_bytes: int) -> np.ndarray:
    """Canonical limbs int32[20, n] -> (n, width_bytes) little-endian records.

    Vectorized; limbs must be canonical (strong_normalize output).
    """
    limbs = np.asarray(canonical)
    if limbs.ndim == 1:
        limbs = limbs[:, None]
    n = limbs.shape[1]
    bits = (
        (limbs.astype(np.uint16)[:, None, :] >> np.arange(LIMB_BITS, dtype=np.uint16)[None, :, None])
        & 1
    ).astype(np.uint8)
    bits = bits.reshape(NLIMB * LIMB_BITS, n).T  # bit 12*limb + b, LSB first
    packed = np.packbits(bits, axis=1, bitorder="little")  # (n, 30)
    out = np.zeros((n, width_bytes), dtype=np.uint8)
    w = min(width_bytes, packed.shape[1])
    assert not packed[:, w:].any(), "value does not fit in record width"
    out[:, :w] = packed[:, :w]
    return out


def zeros(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((NLIMB, *batch_shape), dtype=jnp.int32)


def ones(batch_shape=()) -> jnp.ndarray:
    o = np.zeros((NLIMB, *batch_shape), dtype=np.int32)
    o[0] = 1
    return jnp.asarray(o)


def broadcast_scalar(limbs, batch_shape) -> jnp.ndarray:
    """int32[20] -> int32[20, *batch]."""
    a = jnp.asarray(limbs, dtype=jnp.int32).reshape(
        (NLIMB,) + (1,) * len(batch_shape)
    )
    return jnp.broadcast_to(a, (NLIMB, *batch_shape))


def _dcol(ndim: int) -> jnp.ndarray:
    return jnp.asarray(D_LIMBS.reshape((D_NLIMB,) + (1,) * (ndim - 1)))


# ---------------------------------------------------------------------------
# Core loose-limb kernels (all shapes: int32[L, *batch], limb axis first)
# ---------------------------------------------------------------------------

def _carry_pass(v: jnp.ndarray) -> jnp.ndarray:
    """One width-preserving local carry pass (signed, arithmetic shift).

    The carry out of the top limb weighs 2^(12*width) =
    2^(12*off) * 2^240 = -2^(12*off) * D (mod p), so it folds back by
    subtracting the D-scaled carry at limb offset `off`.
    """
    off = v.shape[0] - NLIMB
    c = v >> LIMB_BITS
    v = v & MASK  # non-negative remainder, also for negative limbs
    v = v.at[1:].add(c[:-1])
    return v.at[off : off + D_NLIMB].add(-c[-1] * _dcol(v.ndim))


def _fold_top(v: jnp.ndarray) -> jnp.ndarray:
    """Fold limbs >= NLIMB back through -D; input limbs must be small."""
    width = v.shape[0]
    if width <= NLIMB:
        return v
    lo, hi = v[:NLIMB], v[NLIMB:]
    n_hi = width - NLIMB
    out_width = max(NLIMB, n_hi + D_NLIMB)
    acc = jnp.zeros((out_width, *v.shape[1:]), dtype=jnp.int32)
    acc = acc.at[:NLIMB].add(lo)
    for j in range(D_NLIMB):
        acc = acc.at[j : j + n_hi].add(hi * np.int32(-int(D_LIMBS[j])))
    return acc


def weak_normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Any-width int32 limbs (|column| < 2^31) -> NLIMB loose limbs (<= ~8300)."""
    while v.shape[0] > NLIMB:
        v = _carry_pass(_carry_pass(_carry_pass(v)))
        v = _fold_top(v)
    return _carry_pass(_carry_pass(_carry_pass(v)))


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return weak_normalize(a + b)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return weak_normalize(a - b)


def neg(b: jnp.ndarray) -> jnp.ndarray:
    return weak_normalize(-b)


def _conv(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook limb convolution; exact in int32 given loose inputs."""
    out_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    out = jnp.zeros((2 * NLIMB - 1, *out_shape), dtype=jnp.int32)
    for i in range(NLIMB):
        out = out.at[i : i + NLIMB].add(a[i] * b)
    return out


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return weak_normalize(_conv(a, b))


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def mul_const(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply by a compile-time integer constant."""
    b = jnp.asarray(from_int(c)).reshape((NLIMB,) + (1,) * (a.ndim - 1))
    return mul(a, b)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise select over the batch shape (True -> a)."""
    return jnp.where(mask[None, ...], a, b)


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-known exponent, left-to-right square-and-multiply.

    Small exponents unroll; large ones run as a lax.scan over the bit
    string so the jitted graph stays compact (one square + one masked
    multiply per step).
    """
    if e == 0:
        return ones(a.shape[1:])
    bits = bin(e)[2:]
    if len(bits) <= 16:
        acc = a
        for bit in bits[1:]:
            acc = mul(acc, acc)
            if bit == "1":
                acc = mul(acc, a)
        return acc

    bit_arr = jnp.asarray([int(b) for b in bits[1:]], dtype=jnp.int32)

    def body(acc, bit):
        acc = mul(acc, acc)
        acc = jnp.where(bit == 1, mul(acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, a, bit_arr)
    return acc


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion a^(p-2); inv(0) = 0."""
    return pow_const(a, P - 2)


def strong_normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Fully-canonical limbs in [0, p): the unique representation.

    Adds 2048p (absorbing any negative loose limbs), extracts exact
    base-4096 digits over 21 limbs, then conditionally subtracts
    2048p, 1024p, ..., p.  Loose |value| < 2.03*2^240 < 2048p keeps every
    step in range with no top-limb overflow.
    """
    v = weak_normalize(a)
    off = jnp.asarray(CANON_OFFSET.reshape((_LADDER_WIDTH,) + (1,) * (v.ndim - 1)))
    v = jnp.concatenate([v, jnp.zeros_like(v[:1])], axis=0) + off
    # Exact digit extraction: sequential carry, values fit int32 easily.
    carry = jnp.zeros(v.shape[1:], dtype=jnp.int32)
    digs = []
    for i in range(_LADDER_WIDTH):
        s = v[i] + carry
        digs.append(s & MASK)
        carry = s >> LIMB_BITS
    v = jnp.stack(digs, axis=0)  # canonical 21 digits; carry out == 0
    k = 2048
    while k >= 1:
        kp = _int_to_limbs(k * P, _LADDER_WIDTH)
        ge = _ge_const(v, kp)
        v = jnp.where(ge[None, ...], _sub_const_borrow(v, kp), v)
        k //= 2
    return v[:NLIMB]


def _ge_const(v: jnp.ndarray, c_limbs: np.ndarray) -> jnp.ndarray:
    """Lexicographic >= compare of canonical digits against a constant."""
    w = v.shape[0]
    c = jnp.asarray(c_limbs.reshape((w,) + (1,) * (v.ndim - 1)))
    gt = v > c
    lt = v < c
    res = jnp.zeros(v.shape[1:], dtype=jnp.bool_)
    decided = jnp.zeros(v.shape[1:], dtype=jnp.bool_)
    for i in range(w - 1, -1, -1):
        res = jnp.where(~decided & gt[i], True, res)
        decided = decided | gt[i] | lt[i]
    return res | ~decided  # all-equal -> >=


def _sub_const_borrow(v: jnp.ndarray, c_limbs: np.ndarray) -> jnp.ndarray:
    """v - c with borrow propagation (requires v >= c, canonical digits)."""
    w = v.shape[0]
    borrow = jnp.zeros(v.shape[1:], dtype=jnp.int32)
    out = []
    for i in range(w):
        d = v[i] - jnp.int32(int(c_limbs[i])) - borrow
        nb = (d < 0).astype(jnp.int32)
        out.append(d + nb * BASE)
        borrow = nb
    return jnp.stack(out, axis=0)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over batch: value == 0 mod p."""
    return jnp.all(strong_normalize(a) == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return is_zero(sub(a, b))


# ---------------------------------------------------------------------------
# Bulk helpers
# ---------------------------------------------------------------------------

def sum_along(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Field sum along a batch axis (axis counted in batch dims, 0-based)."""
    ax = axis + 1
    n = a.shape[ax]
    # Raw int32 limb sums stay exact while n * 8300 < 2^31.
    chunk = 250_000
    if n <= chunk:
        return weak_normalize(jnp.sum(a, axis=ax))
    total = None
    for s in range(0, n, chunk):
        part = weak_normalize(
            jnp.sum(jax.lax.slice_in_dim(a, s, min(s + chunk, n), axis=ax), axis=ax)
        )
        total = part if total is None else add(total, part)
    return total


def _shift_fill_one(u: jnp.ndarray, s: int, ax: int, reverse: bool):
    """Shift by s along ax, filling vacated slots with Fr one."""
    n = u.shape[ax]
    # broadcastable (20, 1, ..., 1) ones: a full-shape constant would be
    # embedded in the lowered module once per scan stage and only MLIR
    # attribute dedup keeps 2^20+-lane modules under the tunnel's size cap
    one_vec = ones(tuple(1 for _ in u.shape[1:]))
    idx = jnp.arange(n).reshape(
        tuple(n if d == ax - 1 else 1 for d in range(u.ndim - 1))
    )
    if reverse:
        return select(idx >= n - s, one_vec, jnp.roll(u, -s, axis=ax))
    return select(idx < s, one_vec, jnp.roll(u, s, axis=ax))


def _scan_mul(v: jnp.ndarray, ax: int, reverse: bool = False):
    """Inclusive product scan along axis `ax` (Hillis-Steele doubling).

    Replaces jax.lax.associative_scan(mul, ...): Blelloch's lowering
    emits non-uniform odd/even slice shapes per stage, and the XLA
    fusion planner on those stalled the tunneled TPU compiler for 30+
    minutes on a single (20, 2^18) batch_inverse program (2026-08-20).
    Here every stage is mul + roll + masked select at the FULL uniform
    shape (2x the multiplies of work-efficient scan, identical O(log n)
    depth), which compiles like any other elementwise program."""
    s = 1
    n = v.shape[ax]
    while s < n:
        v = mul(v, _shift_fill_one(v, s, ax, reverse))
        s <<= 1
    return v


def batch_inverse(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Montgomery-trick batched inversion along a batch axis.

    Mirrors ark_ff::batch_inversion call sites (reference: src/ec_fft.rs:332,
    src/proving.rs:604-615, src/srs.rs:307) as prefix/suffix-product scans so
    one Fermat inversion serves the whole batch.  Zero entries map to zero
    (the reference never inverts zero; we keep the same contract).
    """
    ax = axis + 1
    zmask = is_zero(a)
    safe = select(zmask, ones(a.shape[1:]), a)
    pref = _scan_mul(safe, ax)
    total = jax.lax.index_in_dim(pref, a.shape[ax] - 1, axis=ax, keepdims=True)
    inv_total = inv(total)
    suf = _scan_mul(safe, ax, reverse=True)
    pref_shift = _shift_fill_one(pref, 1, ax, False)
    suf_shift = _shift_fill_one(suf, 1, ax, True)
    out = mul(mul(pref_shift, suf_shift), inv_total)
    return select(zmask, zeros(a.shape[1:]), out)


def horner_eval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[:, i] * x^i  (coeffs int32[20, n], x int32[20])."""
    n = coeffs.shape[1]

    def body(acc, i):
        c = jax.lax.dynamic_index_in_dim(coeffs, n - 1 - i, axis=1, keepdims=False)
        return add(mul(acc, x), c), None

    acc, _ = jax.lax.scan(body, zeros(()), jnp.arange(n))
    return acc


def poly_eval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sum_i coeffs[:, i] x^i, log-depth: powers scan + wide dot.

    horner_eval is a length-n sequential lax.scan of scalar muls --
    latency-bound at ~us/step, i.e. seconds at n = 2^20 (the m=2^16
    scale run spent ~6 s of its 12.4 s warm prove in three such scans).
    The powers+sum form does the same O(n) multiplies in ~2 log n
    full-width passes."""
    n = coeffs.shape[-1]
    if n <= 64:
        return horner_eval(coeffs, x)
    return sum_along(mul(coeffs, powers(x, n)), axis=0)


def powers(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(n-1)] as int32[20, n] via a log-depth scan
    (_scan_mul doubling -- see its docstring for why not
    associative_scan)."""
    x = jnp.asarray(x, dtype=jnp.int32)
    xb = jnp.broadcast_to(x[:, None], (NLIMB, n))
    xb = jnp.concatenate([ones(())[:, None], xb[:, 1:]], axis=1)
    return _scan_mul(xb, 1)
