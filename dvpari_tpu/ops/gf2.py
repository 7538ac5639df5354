"""GF(2^233) as batched TPU kernels: carry-less limb arithmetic on the VPU.

Replaces the reference's xs233-sys C backend field layer (reference:
src/curve.rs:13; SURVEY.md C1).  TPUs have no CLMUL instruction, so the
carry-less multiply is built from uniform shift/mask/xor passes over
uint32 words - fully branch-free and batched so every VPU lane carries
an independent field element.

Layout: an element batch is `uint32[8, *batch]` - 8 little-endian 32-bit
words, bits 233..255 always zero.  Word axis first so batch axes land on
TPU lanes (same convention as dvpari_tpu.ops.fr).

Reduction: the sect233 trinomial x^233 + x^74 + 1 gives a two-fold
word-shift reduction.  Squaring is a linear bit-spread (Frobenius),
inversion is Itoh-Tsujii (10 multiplies + 232 cheap squarings), and
trace is a 2-bit mask dot thanks to the trinomial's sparse dual basis
(mask derived and cross-checked in dvpari_tpu.utils.gf2_host).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.utils.gf2_host import TRACE_MASK

M = 233
NWORD = 8
W = 32
TOP_MASK = np.uint32(0x1FF)  # word 7 holds bits 224..232 -> 9 live bits


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------

def from_int(values) -> np.ndarray:
    if isinstance(values, (int, np.integer)):
        v = int(values)
        assert v >> M == 0
        return np.array([(v >> (W * i)) & 0xFFFFFFFF for i in range(NWORD)],
                        dtype=np.uint32)
    values = list(values)
    out = np.zeros((NWORD, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        v = int(v)
        assert v >> M == 0
        for i in range(NWORD):
            out[i, j] = (v >> (W * i)) & 0xFFFFFFFF
    return out


def to_int(words):
    arr = np.asarray(jax.device_get(words), dtype=np.uint64)
    if arr.ndim == 1:
        return sum(int(arr[i]) << (W * i) for i in range(NWORD))
    flat = arr.reshape(NWORD, -1)
    return [sum(int(flat[i, j]) << (W * i) for i in range(NWORD))
            for j in range(flat.shape[1])]


def zeros(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((NWORD, *batch_shape), dtype=jnp.uint32)


def ones(batch_shape=()) -> jnp.ndarray:
    o = np.zeros((NWORD, *batch_shape), dtype=np.uint32)
    o[0] = 1
    return jnp.asarray(o)


def broadcast_scalar(words, batch_shape) -> jnp.ndarray:
    a = jnp.asarray(words, dtype=jnp.uint32).reshape(
        (NWORD,) + (1,) * len(batch_shape)
    )
    return jnp.broadcast_to(a, (NWORD, *batch_shape))


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------

def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field addition == XOR (characteristic 2)."""
    return a ^ b


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return is_zero(a ^ b)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask[None, ...], a, b)


def _clmul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Carry-less 233x233 -> 465-bit product as uint32[16, *batch].

    32 shift-accumulate passes; the per-word loop is unrolled (8 static
    iterations) while the bit loop is a lax.fori_loop so the traced graph
    stays compact.
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (NWORD, *batch))
    b = jnp.broadcast_to(b, (NWORD, *batch))
    acc0 = jnp.zeros((2 * NWORD, *batch), dtype=jnp.uint32)
    # a_sh: a << i within 9 words
    a_sh0 = jnp.concatenate([a, jnp.zeros((1, *batch), jnp.uint32)], axis=0)

    def body(i, carry):
        acc, a_sh = carry
        for j in range(NWORD):
            bit = (b[j] >> i) & 1
            mask = (jnp.uint32(0) - bit)[None, ...]
            seg = acc[j : j + 9] ^ (a_sh & mask)
            # concat form instead of .at[] so Pallas can lower it
            parts = [seg] if j == 0 else [acc[:j], seg]
            if j + 9 < 2 * NWORD:
                parts.append(acc[j + 9 :])
            acc = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        # shift a_sh left by one bit across words
        hi = a_sh >> 31
        a_sh = (a_sh << 1) | jnp.concatenate(
            [jnp.zeros((1, *batch), jnp.uint32), hi[:-1]], axis=0
        )
        return acc, a_sh

    acc, _ = jax.lax.fori_loop(0, W, body, (acc0, a_sh0))
    return acc


def _shift_left_bits(v: jnp.ndarray, bits: int, out_words: int) -> jnp.ndarray:
    """v << bits into an out_words-wide array (static shift)."""
    wshift, bshift = divmod(bits, W)
    batch = v.shape[1:]
    n = min(v.shape[0], out_words - wshift)
    parts = []
    if wshift:
        parts.append(jnp.zeros((wshift, *batch), dtype=jnp.uint32))
    parts.append(v[:n])
    tail = out_words - wshift - n
    if tail:
        parts.append(jnp.zeros((tail, *batch), dtype=jnp.uint32))
    padded = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    if bshift:
        lo = padded << bshift
        hi = padded >> (W - bshift)
        padded = lo | jnp.concatenate(
            [jnp.zeros((1, *batch), jnp.uint32), hi[:-1]], axis=0
        )
    return padded


def _shift_right_233(v: jnp.ndarray, out_words: int) -> jnp.ndarray:
    """(v >> 233) into out_words words (233 = 7*32 + 9)."""
    batch = v.shape[1:]
    nin = v.shape[0]
    vpad = jnp.concatenate(
        [v, jnp.zeros((out_words + 8 - nin + 1, *batch), jnp.uint32)], axis=0
    ) if nin < out_words + 8 + 1 else v
    rows = []
    for k in range(out_words):
        rows.append((vpad[k + 7] >> 9) | (vpad[k + 8] << 23))
    return jnp.stack(rows, axis=0)


def _mask_top(w: jnp.ndarray) -> jnp.ndarray:
    """Mask word 7 to its 9 live bits (concat form: Pallas-lowerable)."""
    return jnp.concatenate([w[:7], w[7:8] & TOP_MASK], axis=0)


def _mod_reduce(v: jnp.ndarray) -> jnp.ndarray:
    """Reduce a <=465-bit value (16 words) mod x^233 + x^74 + 1."""
    batch = v.shape[1:]
    # fold 1: hi = bits 233.., up to 232 bits -> 8 words
    hi = _shift_right_233(v, 8)
    lo = _mask_top(v[:NWORD])
    r = jnp.concatenate(
        [lo ^ hi, jnp.zeros((2, *batch), jnp.uint32)], axis=0
    )  # 10 words: deg(hi << 74) <= 305
    r = r ^ _shift_left_bits(hi, 74, 10)
    # fold 2: remaining high part has deg <= 72 -> 3 words
    hi2 = _shift_right_233(r, 3)
    lo2 = _mask_top(r[:NWORD])
    lo2 = jnp.concatenate([lo2[:3] ^ hi2, lo2[3:]], axis=0)
    lo2 = lo2 ^ _shift_left_bits(hi2, 74, NWORD)
    return lo2


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _mod_reduce(_clmul_wide(a, b))


_SPREAD_MASKS = [
    (8, np.uint32(0x00FF00FF)),
    (4, np.uint32(0x0F0F0F0F)),
    (2, np.uint32(0x33333333)),
    (1, np.uint32(0x55555555)),
]


def _spread16(h: jnp.ndarray) -> jnp.ndarray:
    """Interleave zeros into the low 16 bits of each word (Morton spread)."""
    t = h & jnp.uint32(0xFFFF)
    for sh, mask in _SPREAD_MASKS:
        t = (t | (t << sh)) & mask
    return t


def square(a: jnp.ndarray) -> jnp.ndarray:
    """Frobenius: squaring is the linear bit-spread followed by reduction."""
    rows = []
    for i in range(NWORD):
        rows.append(_spread16(a[i]))
        rows.append(_spread16(a[i] >> 16))
    return _mod_reduce(jnp.stack(rows, axis=0))


def sqr_k(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a^(2^k) via k squarings (lax loop: squaring is cheap and linear)."""
    if k <= 4:
        for _ in range(k):
            a = square(a)
        return a
    return jax.lax.fori_loop(0, k, lambda _, x: square(x), a)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Itoh-Tsujii a^(2^233 - 2); inv(0) = 0."""
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


def sqrt(a: jnp.ndarray) -> jnp.ndarray:
    """a^(2^232): the inverse Frobenius."""
    return sqr_k(a, M - 1)


_TRACE_MASK_WORDS = from_int(TRACE_MASK)


def trace(a: jnp.ndarray) -> jnp.ndarray:
    """Tr: GF(2^233) -> GF(2) via the sparse dual-basis mask (uint32 out)."""
    tm = jnp.asarray(
        _TRACE_MASK_WORDS.reshape((NWORD,) + (1,) * (a.ndim - 1))
    )
    masked = a & tm
    acc = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    for i in range(NWORD):
        acc = acc ^ masked[i]
    # parity of acc's bits
    for sh in (16, 8, 4, 2, 1):
        acc = acc ^ (acc >> sh)
    return acc & 1


def halftrace(a: jnp.ndarray) -> jnp.ndarray:
    """H(a) = sum a^(2^(2i)); solves z^2 + z = a when Tr(a) = 0."""

    def body(_, carry):
        t, acc = carry
        t = square(square(t))
        return t, acc ^ t

    _, acc = jax.lax.fori_loop(0, (M - 1) // 2, body, (a, a))
    return acc
