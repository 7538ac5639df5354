"""Batched dense polynomial arithmetic over Fr.

Coefficient arrays are int32[20, *batch, n] (limb axis first, coefficient
axis last) in the monomial basis, degree < n.

Used by the FFTree for vanishing-polynomial product trees and the
coefficient-combine step of `exit` (interpolation).  Multiplication is
schoolbook below a cutoff and batched Karatsuba above it - level-wise
batching keeps everything as large elementwise Fr ops, which is what the
TPU VPU wants (no NTT exists over Fr; that's the whole reason ECFFT
exists - reference: src/ec_fft.rs:1-50).
"""

from __future__ import annotations

import jax.numpy as jnp

from dvpari_tpu.ops import fr

_SCHOOLBOOK_CUTOFF = 16

# Cap on Karatsuba recursion depth: breadth-first batching grows the
# working set by (3/2)^depth, so deep trees trade memory for the
# O(n^1.585) op count.  12 levels keeps the blowup under ~130x while
# still covering 2^16-length splits down to the schoolbook cutoff.
_MAX_KARATSUBA_DEPTH = 12


def _zeros_like_coeffs(a, n):
    return jnp.zeros((*a.shape[:-1], n), dtype=jnp.int32)


def _padded_add(res, seg, off):
    """res[..., off:off+seg_len] = fr.add(res segment, seg) without aliasing."""
    seg_len = seg.shape[-1]
    chunk = res[..., off : off + seg_len]
    return res.at[..., off : off + seg_len].set(fr.add(chunk, seg))


def _polymul_eq(a: jnp.ndarray, b: jnp.ndarray, depth: int = 0) -> jnp.ndarray:
    """Equal-length batched product: (20, B, n) x (20, B, n) -> (20, B, 2n-1).

    Level-synchronous Karatsuba: the three half-size subproducts
    (a0 b0, a1 b1, (a0+a1)(b0+b1)) are CONCATENATED on the batch axis
    and handled by ONE recursive call, so the traced graph is O(depth)
    uniform stages instead of the 3^depth call tree a naive recursion
    unrolls into.  This is what lets z_poly compile at 2^18+ domains
    (reference treats z_poly as a multi-hour precompute,
    src/artifacts.rs:85-123; JOURNAL item 5).
    """
    n = a.shape[-1]
    if n <= _SCHOOLBOOK_CUTOFF or n % 2 or depth >= _MAX_KARATSUBA_DEPTH:
        return _schoolbook(a, b)
    h = n // 2
    a0, a1 = a[..., :h], a[..., h:]
    b0, b1 = b[..., :h], b[..., h:]
    A = jnp.concatenate([a0, a1, fr.add(a0, a1)], axis=-2)
    B = jnp.concatenate([b0, b1, fr.add(b0, b1)], axis=-2)
    P = _polymul_eq(A, B, depth + 1)  # (20, 3B, 2h-1)
    Bn = a.shape[-2]
    p0 = P[..., :Bn, :]
    p2 = P[..., Bn : 2 * Bn, :]
    pm = P[..., 2 * Bn :, :]
    p1 = fr.sub(fr.sub(pm, p0), p2)
    res = jnp.zeros((*a.shape[:-1], 2 * n - 1), dtype=jnp.int32)
    res = _padded_add(res, p0, 0)
    res = _padded_add(res, p1, h)
    res = _padded_add(res, p2, 2 * h)
    return res


def polymul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product: (..., na) x (..., nb) -> (..., na+nb-1)."""
    na, nb = a.shape[-1], b.shape[-1]
    if min(na, nb) <= _SCHOOLBOOK_CUTOFF:
        return _schoolbook(a, b)
    # pad to a power of two so every Karatsuba half stays even (product-
    # tree polys are monic with 2^k + 1 coeffs -- odd -- and an odd
    # length would force an early schoolbook on a huge operand)
    n = 1 << (max(na, nb) - 1).bit_length()
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - na)])
    b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, n - nb)])
    # normalize to a 3-axis (20, B, n) batch for the level-synchronous core
    bshape = jnp.broadcast_shapes(a.shape[1:-1], b.shape[1:-1])
    a = jnp.broadcast_to(a, (fr.NLIMB, *bshape, n)).reshape(fr.NLIMB, -1, n)
    b = jnp.broadcast_to(b, (fr.NLIMB, *bshape, n)).reshape(fr.NLIMB, -1, n)
    res = _polymul_eq(a, b)
    return res.reshape(fr.NLIMB, *bshape, 2 * n - 1)[..., : na + nb - 1]


def _schoolbook(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    na, nb = a.shape[-1], b.shape[-1]
    if na > nb:
        a, b, na, nb = b, a, nb, na
    bshape = jnp.broadcast_shapes(a.shape[1:-1], b.shape[1:-1])
    out = jnp.zeros((fr.NLIMB, *bshape, na + nb - 1), dtype=jnp.int32)
    for i in range(na):
        term = fr.mul(a[..., i : i + 1], b)  # (..., nb)
        out = _padded_add(out, term, i)
    return out


def vanishing_poly_coeffs(points: jnp.ndarray) -> jnp.ndarray:
    """prod_i (x - s_i) for points int32[20, n] -> coeffs int32[20, n+1].

    Product tree: level k holds n/2^k polynomials of degree 2^k, batched
    on a middle axis so each level is one big Fr op.
    """
    n = points.shape[-1]
    assert n & (n - 1) == 0, "power-of-two domain"
    # level 0: (x - s): coeffs [[-s], [1]]
    neg = fr.neg(points)  # (20, n)
    ones = fr.broadcast_scalar(fr.from_int(1), (n,))
    polys = jnp.stack([neg, ones], axis=-1)  # (20, n, 2)
    while polys.shape[-2] > 1:
        a = polys[..., 0::2, :]
        b = polys[..., 1::2, :]
        prod = polymul(a, b)  # (20, m/2, 2c-1), degree exact so top coeff 1
        # full product of two monic polys of degree d has 2d+1 coeffs = 2c-1
        polys = prod
    return polys[..., 0, :]


def poly_derivative(coeffs: jnp.ndarray) -> jnp.ndarray:
    """d/dx: (..., n) -> (..., n-1): i * c_i (reference: src/ec_fft.rs:392-404)."""
    n = coeffs.shape[-1]
    scale = fr.from_int(list(range(1, n)))  # (20, n-1)
    shape = (fr.NLIMB,) + (1,) * (coeffs.ndim - 2) + (n - 1,)
    return fr.mul(coeffs[..., 1:], jnp.asarray(scale).reshape(shape))
