"""Device-side tau-adic NAF recoding: canonical Fr limbs -> bit-sliced
ladder masks entirely on-device.

The host recoder (ops/tnaf.py + native dv_tnaf_recode_masks) mirrors the
reference's choice of keeping recoding native (inside xsk233_mul_frob,
reference: src/curve.rs:113-137).  On this architecture that choice costs
two O(n) host<->device transfers per MSM (canonical scalars D2H ~80 B/pt,
digit masks H2D ~93 B/pt) which dominate the prove once the point planes
are device-resident.  This module recodes on-device instead, as one jitted
XLA program per chunk, so the whole MSM pipeline (normalize -> partmod ->
tau-NAF -> window codes -> masks -> Pallas ladder) never leaves the chip.

Math (identical to ops/tnaf.py, which remains the oracle in tests):
 1. partmod: rho = k - q*DELTA with q ~= round(k*conj(DELTA)/N(DELTA)),
    computed Barrett-style: q_i = (k*|C_i| + 2^(E-1)) >> E with
    C_i = round(2^E conj(DELTA)_i / N(DELTA)) precomputed.  q may differ
    from the host's exactly-rounded q by +-1 per component; ANY integer q
    gives a correct rho (rho == k mod DELTA, and DELTA kills the prime
    subgroup), it only lengthens the expansion by O(1) digits -- so host
    and device DIGIT STREAMS differ while the MSM results are equal.
    Tests check the algebraic invariant (sum u_i tau^i == k mod DELTA)
    and end-to-end MSM equality instead of digit equality.
 2. tau-NAF digit loop: 248 lax.scan steps on (c, d) in two's-complement
    radix-2^24 limbs (7 limbs = 168 bits; |rho| components stay < 2^121
    even with the Barrett slack).
 3. width-4 window codes + one-hot digit masks, packed little-endian to
    uint32 as the fused ladder expects (ops/xsk233_bs.py:digit_masks).

All integer arithmetic is exact int32 lane math: 12-bit-limb convolutions
keep partial sums < 2^31; the scan keeps limbs normalized to [0, 2^24).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dvpari_tpu.ops import fr
from dvpari_tpu.ops.tnaf import (
    DELTA,
    N_DELTA,
    N_WINDOWS,
    TABLE_SIZE,
    TNAF_LEN,
    _zt_conj,
)

# Barrett shift: 21 whole 12-bit limbs.  Error analysis: |C_i| carries
# <= 0.5 ulp of 2^E conj_i/N, so |k*C_i/2^E - k*conj_i/N| <= 2^233/2^(E+1)
# = 2^-20; adding 2^(E-1) before the shift rounds to nearest, so
# |q_dev - q_host| <= 1 per component.
_E = 252
assert _E % 12 == 0
_E_LIMB = _E // 12

_CONJ = _zt_conj(DELTA)


def _round_div(a: int, b: int) -> int:
    """round(a/b), b > 0, half away from zero."""
    return (2 * a + b) // (2 * b) if a >= 0 else -((-2 * a + b) // (2 * b))


_C = [_round_div((1 << _E) * c, N_DELTA) for c in _CONJ]
_C_SIGN = [1 if c >= 0 else -1 for c in _C]
_D_SIGN = [1 if d >= 0 else -1 for d in DELTA]


def _limbs12(x: int) -> "list[int]":
    """|x| as 12-bit limbs, minimal length."""
    x = abs(x)
    out = []
    while x:
        out.append(x & 0xFFF)
        x >>= 12
    return out or [0]


_C_LIMBS = [_limbs12(c) for c in _C]
_D_LIMBS = [_limbs12(d) for d in DELTA]

# rho working width for the digit scan: 7 x 24-bit = 168-bit
# two's-complement (components stay < ~2^121).
_RL = 7
_R12 = 2 * _RL  # 14 twelve-bit limbs before pairing


def _conv(k_limbs, c_limbs: "list[int]") -> "list[jnp.ndarray]":
    """Exact big-int product: (LK, N) 12-bit limb planes x constant
    12-bit limbs -> unnormalized limb accumulators (values < 2^28.4)."""
    LK = len(k_limbs)
    LC = len(c_limbs)
    acc = [None] * (LK + LC - 1)
    for j, cj in enumerate(c_limbs):
        if cj == 0:
            continue
        for i in range(LK):
            t = k_limbs[i] * np.int32(cj)
            acc[i + j] = t if acc[i + j] is None else acc[i + j] + t
    z = jnp.zeros_like(k_limbs[0])
    return [z if a is None else a for a in acc]


def _carry_pass(acc: "list[jnp.ndarray]", out_len: int) -> "list[jnp.ndarray]":
    """Sequential signed carry normalization to 12-bit limbs; result
    two's-complement mod 2^(12*out_len) (limbs in [0, 2^12))."""
    acc = list(acc) + [jnp.zeros_like(acc[0])] * (out_len - len(acc))
    out = []
    carry = None
    for i in range(out_len):
        v = acc[i] if i < len(acc) else jnp.zeros_like(acc[0])
        if carry is not None:
            v = v + carry
        carry = v >> 12  # arithmetic: floor division by 4096
        out.append(v & 0xFFF)
    return out


def _partmod_limbs(canon: jnp.ndarray) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """Canonical Fr limbs (20, N) int32 -> rho = (c, d), each (RL, N)
    int32 in normalized two's-complement radix-2^24 limbs."""
    k = [canon[i] for i in range(canon.shape[0])]

    # q_i = +-((k*|C_i| + 2^(E-1)) >> E): convolution, carry, shift.
    q = []
    for ci_limbs, ci_sign in zip(_C_LIMBS, _C_SIGN):
        acc = _conv(k, ci_limbs)
        # + 2^(E-1): bit 251 = limb 20 bit 11
        half_limb = (_E - 1) // 12
        acc[half_limb] = acc[half_limb] + np.int32(1 << ((_E - 1) % 12))
        norm = _carry_pass(acc, len(acc) + 2)
        q.append((norm[_E_LIMB:], ci_sign))  # magnitude limbs, sign

    (q0, s0), (q1, s1) = q
    d0_l, d1_l = _D_LIMBS
    sd0, sd1 = _D_SIGN

    # qd = q * DELTA in Z[tau] (mu = -1):
    #   qd0 = q0*D0 - 2*q1*D1,  qd1 = q0*D1 + q1*D0 - q1*D1
    def smul(ql, qs, dl, ds, coef):
        sgn = qs * ds * coef
        prod = _conv(ql, dl)
        return [p * np.int32(sgn) for p in prod]

    def ladd(a, b):
        n = max(len(a), len(b))
        z = jnp.zeros_like(a[0])
        return [
            (a[i] if i < len(a) else z) + (b[i] if i < len(b) else z)
            for i in range(n)
        ]

    qd0 = ladd(smul(q0, s0, d0_l, sd0, 1), smul(q1, s1, d1_l, sd1, -2))
    qd1 = ladd(
        ladd(smul(q0, s0, d1_l, sd1, 1), smul(q1, s1, d0_l, sd0, 1)),
        smul(q1, s1, d1_l, sd1, -1),
    )

    # rho0 = k - qd0, rho1 = -qd1; normalize mod 2^(12*_R12).
    z = jnp.zeros_like(k[0])
    rho0 = [
        (k[i] if i < len(k) else z) - (qd0[i] if i < len(qd0) else z)
        for i in range(_R12)
    ]
    rho1 = [-(qd1[i] if i < len(qd1) else z) for i in range(_R12)]
    rho0 = _carry_pass(rho0, _R12)
    rho1 = _carry_pass(rho1, _R12)

    def pair24(l12):
        limbs = [l12[2 * i] + (l12[2 * i + 1] << 12) for i in range(_RL)]
        # _carry_pass normalizes mod 2^168 (two's complement); the scan
        # needs the EXACT integer, and |rho| < 2^122 << 2^167, so sign-
        # extending the top limb recovers it: subtract 2^24 if bit 167.
        limbs[-1] = limbs[-1] - (((limbs[-1] >> 23) & 1) << 24)
        return jnp.stack(limbs)

    return pair24(rho0), pair24(rho1)


# -- radix-2^24 two's-complement helpers (limbs (RL, N) int32 in [0, 2^24)) --

_MASK24 = np.int32((1 << 24) - 1)


def _norm24(limbs: jnp.ndarray) -> jnp.ndarray:
    """One full sequential borrow/carry pass (inputs within +-2^30/limb);
    result limbs in [0, 2^24), two's complement mod 2^(24*RL)."""
    out = []
    carry = None
    for i in range(_RL):
        v = limbs[i] if carry is None else limbs[i] + carry
        carry = v >> 24
        out.append(v & _MASK24)
    return jnp.stack(out)


def _renorm_lazy(limbs: jnp.ndarray) -> jnp.ndarray:
    """One vectorized carry-extraction step (NOT a full propagation):
    push each limb's overflow one limb up.  The TOP limb keeps its own
    overflow so the representation stays an EXACT plain integer -- the
    scan's halving identity is exact-integer arithmetic, and silently
    wrapping mod 2^(24*RL) would corrupt it for negative values
    ((v + k*2^168)/2 = v/2 + k*2^167, not v/2 mod 2^168).  Lower limbs
    stay in (-2, 2^24 + 2); the top limb drifts by O(1) per step
    (values shrink toward zero, so it stays tiny)."""
    t = limbs >> 24  # arithmetic: floor(l / 2^24), handles negatives
    t = t.at[-1].set(0)  # top limb keeps its overflow: exact integer
    lo = limbs - (t << 24)
    carry_in = jnp.concatenate([jnp.zeros_like(t[:1]), t[:-1]], axis=0)
    return lo + carry_in


def _half_lazy(limbs: jnp.ndarray) -> jnp.ndarray:
    """Exact value/2 of an EVEN number in lazy signed limbs: per-limb
    l = 2*(l>>1) + (l&1) identically for int32 two's complement, so
    value/2 = sum (l_i>>1) 2^24i + sum (l_i&1) 2^(24i-1) -- each odd bit
    drops one limb as +2^23 (limb 0 is even because the value is and
    2^24 is)."""
    odd_up = jnp.concatenate([limbs[1:], jnp.zeros_like(limbs[:1])], axis=0)
    return (limbs >> 1) + ((odd_up & 1) << 23)


def _tnaf_scan(c: jnp.ndarray, d: jnp.ndarray):
    """248 tau-NAF digit steps (ops/tnaf.py:tnaf_digits vectorized):
    returns (digits (TNAF_LEN, N) int32 in {-1,0,1}, ok (N,) bool).

    Limbs stay LAZY (signed, roughly-normalized) through the scan:
    parity and mod-4 reads are exact on lazy limbs (2^24 == 0 mod 4),
    halving is exact limb-wise, and a single vectorized carry extraction
    per step replaces three sequential normalize passes (~2x fewer ops,
    and (RL, N)-shaped tensor ops instead of per-limb (N,) chains).

    d needs NO carry extraction at all: new_d = -h where h = half of the
    (renormalized, then u-adjusted) c, so h's limbs sit in (-2, 2^24+2)
    by construction -- bounded without growth across steps.  c's single
    extraction per step then sees d - h in (-2^25-4, 2^24+4), within the
    +-2^30 renorm input budget.  The scan is latency-bound (each step is
    a handful of small VPU ops), so `unroll` trades a longer program for
    fewer loop-carry round trips."""

    def step(carry, _):
        c, d = carry
        u = jnp.where(
            (c[0] & 1) == 1, 2 - ((c[0] - 2 * d[0]) & 3), 0
        )
        h = _half_lazy(c.at[0].add(-u))  # (c - u) even -> exact
        new_c = _renorm_lazy(d - h)
        new_d = -h  # bounded by construction; see docstring
        return (new_c, new_d), u

    (c_end, d_end), digits = lax.scan(
        step, (c, d), None, length=TNAF_LEN, unroll=8
    )
    c_end = _norm24(c_end)  # one full normalization for the zero check
    d_end = _norm24(d_end)
    ok = jnp.all(c_end == 0, axis=0) & jnp.all(d_end == 0, axis=0)
    return digits, ok


def _window_codes(digits: jnp.ndarray):
    """(TNAF_LEN, N) digits -> (idx (62, N), sgn (62, N), valid (N,)).
    Branchless form of ops/tnaf.py:_window_code; NAF adjacency makes
    (0,1),(1,2),(2,3),(0,1,2)... windows impossible, `valid` confirms."""
    w = digits.reshape(N_WINDOWS, 4, -1)
    d0, d1, d2, d3 = w[:, 0], w[:, 1], w[:, 2], w[:, 3]
    nz0, nz1, nz2, nz3 = (
        (d0 != 0).astype(jnp.int32),
        (d1 != 0).astype(jnp.int32),
        (d2 != 0).astype(jnp.int32),
        (d3 != 0).astype(jnp.int32),
    )
    cnt = nz0 + nz1 + nz2 + nz3
    t_single = 1 + nz1 + 2 * nz2 + 3 * nz3
    s_single = d0 + d1 + d2 + d3
    pair02 = (nz0 & nz2) == 1
    pair03 = (nz0 & nz3) == 1
    pair13 = (nz1 & nz3) == 1
    t_pair = jnp.where(
        pair02,
        5 + (d0 != d2),
        jnp.where(pair03, 7 + (d0 != d3), 9 + (d1 != d3)),
    )
    s_pair = jnp.where(pair02 | pair03, d0, d1)
    idx = jnp.where(cnt == 0, 0, jnp.where(cnt == 1, t_single, t_pair))
    sgn = jnp.where(cnt == 0, 1, jnp.where(cnt == 1, s_single, s_pair))
    bad = (cnt > 2) | ((cnt == 2) & ~(pair02 | pair03 | pair13))
    return idx, sgn, ~jnp.any(bad, axis=0)


def _pack_le32(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., G, 32) int32 0/1 -> (..., G) uint32, little-endian bit
    order (bit j = element 32g + j, matching xsk233_bs.digit_masks)."""
    sh = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits.astype(jnp.uint32) << sh, axis=-1, dtype=jnp.uint32)


def recode_masks(canon: jnp.ndarray):
    """Canonical Fr limbs (20, N) int32, N % 32 == 0 -> device ladder
    operands (oh uint32[N_WINDOWS, 11, N/32], ng uint32[N_WINDOWS, N/32],
    ok () bool).  Jit-able; the device twin of
    ops/tnaf.py:recode_masks_bulk (different-but-equivalent digits, see
    module docstring).  `ok` is an algebraic self-check (scan terminated
    and all windows NAF-valid) that callers may fetch lazily."""
    n = canon.shape[-1]
    assert n % 32 == 0, n
    c, d = _partmod_limbs(canon)
    digits, scan_ok = _tnaf_scan(c, d)
    idx, sgn, win_ok = _window_codes(digits)
    oh_bits = (
        idx[:, None, :] == jnp.arange(TABLE_SIZE, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.int32)
    oh = _pack_le32(oh_bits.reshape(N_WINDOWS, TABLE_SIZE, n // 32, 32))
    ng = _pack_le32((sgn < 0).reshape(N_WINDOWS, n // 32, 32).astype(jnp.int32))
    return oh, ng, jnp.all(scan_ok) & jnp.all(win_ok)


recode_masks_jit = jax.jit(recode_masks)


def reconstruct_zt(digits: np.ndarray) -> "tuple[int, int]":
    """Host oracle helper: sum u_i tau^i as (a + b*tau) python ints.
    Used by tests to check the algebraic invariant rho == k (mod DELTA)."""
    a, b = 0, 0
    for u in reversed(np.asarray(digits).tolist()):
        # multiply (a + b tau) by tau: tau^2 = -tau - 2
        a, b = -2 * b, a - b
        a += int(u)
    return a, b
