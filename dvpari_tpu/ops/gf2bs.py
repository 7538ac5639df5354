"""Bit-sliced GF(2^233) for the TPU VPU: 233 bit-plane rows, 32 field
elements per uint32.

This is the TPU-sane layout the word-sliced kernels (ops/gf2.py) cannot
reach: an element batch is `uint32[233, *cols]` where row i holds bit i
of 32*prod(cols) independent field elements -- element e = 32*c + j
lives in bit j of column c.  Every field op is then a uniform AND/XOR
pass over full (233, C) tiles:

* add  = one XOR                                   (233*C lane-ops)
* mul  = 233 shift/AND/XOR passes (schoolbook over bit planes) --
         ~3.5 vreg-ops *per field multiplication* at C=128, versus the
         word-sliced clmul's hundreds of small-op dispatches.
* sqr  = zero-interleave of the rows + trinomial fold (linear, cheap)

The trinomial x^233 + x^74 + 1 keeps the fold static-sliced.  All ops
are pure bitwise, so the 32 elements packed in each uint32 ride along
transparently; masks (per-element predicates) are single uint32 rows.

Replaces the hot-path field layer of the reference's xs233 C backend
(reference: src/curve.rs:13; SURVEY.md C1) for the MSM/ladder engine.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

M = 233
WIDE = 2 * M - 1  # 465


# ---------------------------------------------------------------------------
# Host conversions (numpy, vectorized -- no python-int loops)
# ---------------------------------------------------------------------------

def pack_words(words: np.ndarray) -> np.ndarray:
    """Word layout uint32[8, n] -> bit-planes uint32[233, n/32].

    n must be a multiple of 32 (callers pad with zeros).
    """
    words = np.asarray(words, dtype=np.uint32)
    nw, n = words.shape
    assert nw == 8 and n % 32 == 0, (words.shape,)
    # uint32[8, n] -> bits[256, n]  (LE within each word)
    b8 = words.T.copy().view(np.uint8)  # (n, 32) bytes, LE
    bits = np.unpackbits(b8, axis=1, bitorder="little")  # (n, 256)
    bits = bits[:, :M].T  # (233, n)
    # pack 32 consecutive elements into one uint32 (element j -> bit j)
    packed = np.packbits(
        bits.reshape(M, n // 32, 32), axis=2, bitorder="little"
    )  # (233, n/32, 4) uint8
    # packbits(LE) emits 4 bytes in little-endian order -> view as uint32 LE
    return packed.view(np.uint32)[..., 0].copy()


def unpack_words(planes: np.ndarray) -> np.ndarray:
    """Bit-planes uint32[233, C] -> word layout uint32[8, 32*C]."""
    planes = np.asarray(planes, dtype=np.uint32)
    m, c = planes.shape
    assert m == M
    by = planes[..., None].view(np.uint8)  # (233, C, 4)
    bits = np.unpackbits(by, axis=2, bitorder="little")  # (233, C, 32)
    bits = bits.reshape(M, c * 32)  # (233, n)
    full = np.zeros((256, c * 32), dtype=np.uint8)
    full[:M] = bits
    b8 = np.packbits(
        np.ascontiguousarray(full.T), axis=1, bitorder="little"
    )  # (n, 32) bytes
    return np.ascontiguousarray(np.ascontiguousarray(b8).view(np.uint32).T)


def from_int(values, cols: int | None = None) -> np.ndarray:
    """Python ints -> bit-plane batch (pads to a multiple of 32)."""
    if isinstance(values, (int, np.integer)):
        values = [int(values)]
    values = [int(v) for v in values]
    n = len(values)
    npad = -n % 32
    words = np.zeros((8, n + npad), dtype=np.uint32)
    for j, v in enumerate(values):
        assert v >> M == 0
        for i in range(8):
            words[i, j] = (v >> (32 * i)) & 0xFFFFFFFF
    return pack_words(words)


def to_int(planes) -> "list[int]":
    """Bit-plane batch -> python ints (all 32*C slots)."""
    words = unpack_words(np.asarray(jax.device_get(planes)))
    return [
        sum(int(words[i, j]) << (32 * i) for i in range(8))
        for j in range(words.shape[1])
    ]


# ---------------------------------------------------------------------------
# Core field ops (jnp, shape (233, *cols); work under jit and in Pallas)
# ---------------------------------------------------------------------------

def zeros(cols) -> jnp.ndarray:
    return jnp.zeros((M, *cols), dtype=jnp.uint32)


def ones(cols) -> jnp.ndarray:
    """The constant 1 in every slot: plane 0 all-ones."""
    one = jnp.full((1, *cols), 0xFFFFFFFF, dtype=jnp.uint32)
    return jnp.concatenate([one, jnp.zeros((M - 1, *cols), jnp.uint32)], axis=0)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a ^ b


def _reduce_wide(w: jnp.ndarray) -> jnp.ndarray:
    """Reduce uint32[465, *cols] mod x^233 + x^74 + 1 (static slices).

    bit 233+j folds to j and j+74; the second fold's overflow (rows
    307..464 -> 74+j >= 233) folds once more -- all offsets static.
    """
    c = w[:M]
    h = w[M:]  # 232 rows: bits 233..464
    # first fold at offset 0
    c = c ^ jnp.concatenate([h, jnp.zeros((1,) + h.shape[1:], h.dtype)], axis=0)
    # first fold at offset 74: rows 74..305; split at row 233
    c = c ^ jnp.concatenate(
        [jnp.zeros((74,) + h.shape[1:], h.dtype), h[: M - 74]], axis=0
    )
    over = h[M - 74 :]  # 73 rows, bits 307.. -> positions 233..305 pre-fold
    # those bits sit at 233 + j (j = 0..72): fold to j and j + 74
    pad = jnp.zeros((M - 74 - over.shape[0],) + over.shape[1:], over.dtype)
    c = c ^ jnp.concatenate([over, pad, jnp.zeros((74,) + over.shape[1:], over.dtype)], axis=0)
    c = c ^ jnp.concatenate(
        [jnp.zeros((74,) + over.shape[1:], over.dtype), over, pad], axis=0
    )
    return c


_PAD8 = 240  # M padded to full 8-row vector registers
_ACC8 = 472  # 8*29 + 240: every window slice [8w : 8w+240] is vreg-aligned

# Multiply formulation: "skew" (broadcast partial products + anti-
# diagonal reduction via a pad/reshape skew -- three big tensor ops per
# phase, no read-modify-write) or "concat" (per-window accumulator
# updates via concatenated slices).  Same math; skew avoids the 240
# whole-accumulator copies the concat form implies.  The Pallas ladder
# temporarily forces "concat" while tracing (skew's (30, 240, C)
# transient would not fit VMEM beside the window table).  None = auto:
# "concat" on TPU (hardware-proven), "skew" elsewhere -- override with
# DVPARI_GF2BS_MUL for on-chip A/B.
import os as _os

MUL_IMPL: "str | None" = _os.environ.get("DVPARI_GF2BS_MUL") or None


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook bit-plane multiply, 8-phase aligned-window form.

    c = sum_i (b << i) & a[i] is regrouped by i = 8w + t: for each bit
    phase t the partial sums accumulate at 8-row-aligned offsets
    (vreg-row indexing -- free on TPU), and only the 8 phase results
    need a sub-vreg row shift.  No rolls, no dynamic slices: everything
    is static full-tile AND/XOR, which both XLA and Mosaic lower to
    dense VPU code.
    """
    impl = MUL_IMPL
    if impl is None:
        # conservative on accelerators (concat is hardware-proven; the
        # axon TPU backend reports its own platform name, so gate on cpu)
        impl = "skew" if jax.default_backend() == "cpu" else "concat"
    if impl == "skew":
        return _mul_skew(a, b)
    return _mul_concat(a, b)


def _mul_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    cols = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (M, *cols))
    b = jnp.broadcast_to(b, (M, *cols))
    zcols = jnp.zeros((_PAD8 - M, *cols), jnp.uint32)
    b240 = jnp.concatenate([b, zcols], axis=0)

    total = jnp.zeros((_ACC8, *cols), dtype=jnp.uint32)
    for t in range(8):
        acc = jnp.zeros((_ACC8, *cols), dtype=jnp.uint32)
        for w in range(30):
            r = 8 * w + t
            if r >= M:
                break
            win = acc[8 * w : 8 * w + _PAD8] ^ (b240 & a[r : r + 1])
            parts = [win]
            if w:
                parts.insert(0, acc[: 8 * w])
            if 8 * w + _PAD8 < _ACC8:
                parts.append(acc[8 * w + _PAD8 :])
            acc = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        if t:
            acc = jnp.concatenate(
                [jnp.zeros((t, *cols), jnp.uint32), acc[: _ACC8 - t]], axis=0
            )
        total = total ^ acc
    return _reduce_wide(total[:WIDE])


def _mul_skew(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Aligned-window multiply as broadcast + skewed diagonal reduction.

    Per phase t, ALL 30 window partial products form one broadcast AND
    `P[w] = b240 & a[8w + t]` of shape (30, 240, C); the placement
    `acc[vreg k] = XOR_w P[w][vreg k - w]` is an anti-diagonal sum,
    realized by padding the vreg axis 30 -> 60 and re-viewing the flat
    (30*60)-vreg buffer with stride 59: element (w, k) of the
    (30, 59)-vreg view is P_pad[w][k - w], with out-of-range diagonals
    landing in the zero padding.  Three large tensor ops per phase --
    no per-window accumulator rebuilds.
    """
    cols = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (M, *cols))
    b = jnp.broadcast_to(b, (M, *cols))
    zcols = jnp.zeros((_PAD8 - M, *cols), jnp.uint32)
    b240 = jnp.concatenate([b, zcols], axis=0)  # (240, C)

    total = jnp.zeros((_ACC8, *cols), dtype=jnp.uint32)
    for t in range(8):
        a_t = a[t::8]  # (30 or 29, C): window selector rows
        W = a_t.shape[0]
        # P[w] = b240 & a_t[w]: one broadcast AND, (W, 30, 8, C) vregs
        P = (b240[None] & a_t[:, None]).reshape(W, 30, 8, *cols)
        P = jnp.pad(P, ((0, 0), (0, 30), (0, 0)) + ((0, 0),) * len(cols))
        flat = P.reshape(W * 60, 8, *cols)
        k59 = flat[: 59 * W].reshape(W, 59, 8, *cols)
        # XOR-fold the W windows (log-depth)
        n = W
        while n > 1:
            half = n // 2
            folded = k59[:half] ^ k59[half : 2 * half]
            k59 = (
                jnp.concatenate([folded, k59[2 * half :]], axis=0)
                if n % 2
                else folded
            )
            n = k59.shape[0]
        acc = k59[0].reshape(59 * 8, *cols)  # (472, C)
        if t:
            acc = jnp.concatenate(
                [jnp.zeros((t, *cols), jnp.uint32), acc[: _ACC8 - t]], axis=0
            )
        total = total ^ acc
    return _reduce_wide(total[:WIDE])


def square(a: jnp.ndarray) -> jnp.ndarray:
    """Frobenius: interleave zero rows (bit i -> bit 2i) + fold.

    Implemented as repeat(2, axis=0) + even-row mask so the whole op is
    sublane-uniform (no reshapes across the tiled dims -- both XLA and
    Mosaic lower it cleanly).
    """
    rep = jnp.repeat(a, 2, axis=0)[:WIDE]
    row = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, 0)
    return _reduce_wide(jnp.where((row & 1) == 0, rep, jnp.uint32(0)))


def sqr_k(a: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 4:
        for _ in range(k):
            a = square(a)
        return a
    return jax.lax.fori_loop(0, k, lambda _, x: square(x), a)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Itoh-Tsujii a^(2^233 - 2); inv(0) = 0.  (Not a hot path in the
    bit-sliced engine -- used only for table normalization.)"""
    x1 = a
    x2 = mul(sqr_k(x1, 1), x1)
    x3 = mul(sqr_k(x2, 1), x1)
    x6 = mul(sqr_k(x3, 3), x3)
    x7 = mul(sqr_k(x6, 1), x1)
    x14 = mul(sqr_k(x7, 7), x7)
    x28 = mul(sqr_k(x14, 14), x14)
    x29 = mul(sqr_k(x28, 1), x1)
    x58 = mul(sqr_k(x29, 29), x29)
    x116 = mul(sqr_k(x58, 58), x58)
    x232 = mul(sqr_k(x116, 116), x116)
    return square(x232)


# ---------------------------------------------------------------------------
# Per-element predicates (masks): uint32[*cols], bit j = predicate of
# element 32*c + j.
# ---------------------------------------------------------------------------

def is_zero_mask(a: jnp.ndarray) -> jnp.ndarray:
    """~OR over rows: bit set iff the element is zero (log-depth fold)."""
    pad = jnp.zeros((256 - M, *a.shape[1:]), dtype=a.dtype)
    r = jnp.concatenate([a, pad], axis=0)
    n = 256
    while n > 1:
        n //= 2
        r = r[:n] | r[n:]
    return ~r[0]


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-element bit select (mask bit set -> a)."""
    return (a & mask[None]) | (b & ~mask[None])
