"""Host-side (python-int) GF(2^233) arithmetic: oracle + constant derivation.

The binary field underlying xsk233 (reference: the xs233-sys C library,
consumed at src/curve.rs:13).  Reduction trinomial: x^233 + x^74 + 1.
This module is the slow-but-obviously-correct model that the batched TPU
kernels in dvpari_tpu.ops.gf2 are property-tested against, and it derives
the sparse trace mask baked into those kernels.
"""

from __future__ import annotations

M = 233
TRINOMIAL_K = 74
MOD = (1 << 233) | (1 << 74) | 1


def clmul_int(a: int, b: int) -> int:
    acc = 0
    while b:
        if b & 1:
            acc ^= a
        a <<= 1
        b >>= 1
    return acc


def reduce_int(v: int) -> int:
    while v.bit_length() > M:
        hi = v >> M
        v = (v ^ (hi << M)) ^ hi ^ (hi << TRINOMIAL_K)
    return v


def mul_int(a: int, b: int) -> int:
    return reduce_int(clmul_int(a, b))


def square_int(a: int) -> int:
    return mul_int(a, a)


def pow2k_int(a: int, k: int) -> int:
    for _ in range(k):
        a = square_int(a)
    return a


def inv_int(a: int) -> int:
    """a^(2^233 - 2) via Itoh-Tsujii; inv(0) = 0."""
    if a == 0:
        return 0
    # chain 1,2,3,6,7,14,28,29,58,116,232 for a^(2^k - 1)
    x1 = a
    x2 = mul_int(pow2k_int(x1, 1), x1)
    x3 = mul_int(pow2k_int(x2, 1), x1)
    x6 = mul_int(pow2k_int(x3, 3), x3)
    x7 = mul_int(pow2k_int(x6, 1), x1)
    x14 = mul_int(pow2k_int(x7, 7), x7)
    x28 = mul_int(pow2k_int(x14, 14), x14)
    x29 = mul_int(pow2k_int(x28, 1), x1)
    x58 = mul_int(pow2k_int(x29, 29), x29)
    x116 = mul_int(pow2k_int(x58, 58), x58)
    x232 = mul_int(pow2k_int(x116, 116), x116)
    return square_int(x232)


def sqrt_int(a: int) -> int:
    return pow2k_int(a, M - 1)


def trace_int(a: int) -> int:
    t = a
    acc = a
    for _ in range(M - 1):
        t = square_int(t)
        acc ^= t
    # trace lands in GF(2)
    assert acc in (0, 1)
    return acc


def halftrace_int(a: int) -> int:
    """H(a) = sum a^(2^(2i)), i=0..(m-1)/2; solves z^2 + z = a when Tr(a)=0."""
    t = a
    acc = a
    for _ in range((M - 1) // 2):
        t = square_int(square_int(t))
        acc ^= t
    return acc


def derive_trace_mask() -> int:
    """Bit i set iff Tr(x^i) = 1, so Tr(a) = parity(popcount(a & mask))."""
    mask = 0
    for i in range(M):
        if trace_int(1 << i):
            mask |= 1 << i
    return mask


# Derived once here, baked as a constant (verified in tests).
# For x^233 + x^74 + 1 the dual-basis trace is extremely sparse.
TRACE_MASK = derive_trace_mask()


def trace_fast_int(a: int) -> int:
    return bin(a & TRACE_MASK).count("1") & 1
