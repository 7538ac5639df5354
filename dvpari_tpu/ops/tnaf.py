"""tau-adic NAF recoding for the Koblitz curve sect233k1 (host side).

The Frobenius endomorphism tau(x, y) = (x^2, y^2) satisfies
tau^2 + tau + 2 = 0 on this curve (a = 0 -> mu = -1), and squaring in
GF(2^233) is ~50x cheaper than a group double.  Replacing the
double-and-add ladder with a tau-and-add ladder is the reference's
`xsk233_mulgen_frob`/`xsk233_mul_frob` acceleration
(reference: src/curve.rs:113-137); results are identical by
construction (SURVEY.md C1 note).

Pipeline:
 1. partial reduction (Solinas): rho = k partmod delta,
    delta = (tau^m - 1)/(tau - 1), so the expansion has length ~m
    instead of ~2m;  rho*P = k*P for all P in the prime subgroup
    because delta kills it (N(delta) = r).
 2. tau-NAF expansion of rho: digits in {0, +-1}, no two adjacent
    nonzero, density 1/3.
 3. width-4 windowing for the batched device ladder: each window of 4
    NAF digits takes one of 21 values = sign x {inf, P, tP, t2P, t3P,
    P+-t2P, P+-t3P, tP+-t3P}, so the device ladder is 60 iterations of
    (4 frobenius + table gather + signed add).
"""

from __future__ import annotations

import numpy as np

MU = -1
M = 233


def _zt_mul(a, b):
    """(a0 + a1 tau)(b0 + b1 tau) with tau^2 = mu tau - 2."""
    return (
        a[0] * b[0] - 2 * a[1] * b[1],
        a[0] * b[1] + a[1] * b[0] + MU * a[1] * b[1],
    )


def _zt_conj(a):
    return (a[0] + MU * a[1], -a[1])


def _zt_norm(a) -> int:
    return a[0] * a[0] + MU * a[0] * a[1] + 2 * a[1] * a[1]


def _lucas_u(m: int):
    u = [0, 1]
    for _ in range(m):
        u.append(MU * u[-1] - 2 * u[-2])
    return u


def _delta():
    """(tau^m - 1)/(tau - 1) in Z[tau] (exact division)."""
    u = _lucas_u(M + 1)
    num = (-1 - 2 * u[M - 1], u[M])  # tau^m - 1 = -2 U_{m-1} - 1 + U_m tau
    den = (-1, 1)
    q = _zt_mul(num, _zt_conj(den))
    n = _zt_norm(den)
    assert q[0] % n == 0 and q[1] % n == 0
    return (q[0] // n, q[1] // n)


DELTA = _delta()
N_DELTA = _zt_norm(DELTA)


def partmod(k: int):
    """rho = k - round(k conj(delta)/N(delta)) * delta, in Z[tau]."""
    num = _zt_mul((k, 0), _zt_conj(DELTA))

    def rnd(x: int) -> int:  # round to nearest (half away from zero)
        return (2 * x + N_DELTA) // (2 * N_DELTA) if x >= 0 else -(
            (-2 * x + N_DELTA) // (2 * N_DELTA)
        )

    q = (rnd(num[0]), rnd(num[1]))
    qd = _zt_mul(q, DELTA)
    return (k - qd[0], -qd[1])


def tnaf_digits(c: int, d: int, max_len: int) -> np.ndarray:
    """tau-NAF of c + d tau: int8 digits in {-1, 0, 1}, LSB first."""
    out = np.zeros(max_len, dtype=np.int8)
    i = 0
    while c != 0 or d != 0:
        if c & 1:
            u = 2 - ((c - 2 * d) % 4)  # +-1
            c -= u
        else:
            u = 0
        assert i < max_len, "tau-NAF overflow; increase max_len"
        out[i] = u
        i += 1
        c, d = d - c // 2, -c // 2  # divide by tau (mu = -1)
    return out


# Fixed ladder length: partmod keeps |rho| ~ sqrt(N(delta)) so NAF length
# is ~m; pad generously and assert in tnaf_digits.
TNAF_LEN = 248  # 62 windows of 4
N_WINDOWS = TNAF_LEN // 4

# window pattern -> (table index, sign); table entries:
# 0:inf 1:P 2:tP 3:t2P 4:t3P 5:P+t2P 6:P-t2P 7:P+t3P 8:P-t3P 9:tP+t3P 10:tP-t3P
TABLE_SIZE = 11


def _window_code(d0: int, d1: int, d2: int, d3: int):
    nz = [(0, d0), (1, d1), (2, d2), (3, d3)]
    nz = [(i, v) for i, v in nz if v != 0]
    if not nz:
        return 0, 1
    if len(nz) == 1:
        i, v = nz[0]
        return 1 + i, v
    (i, v), (j, w) = nz
    pair = (i, j)
    if pair == (0, 2):
        return (5, v) if v == w else (6, v)
    if pair == (0, 3):
        return (7, v) if v == w else (8, v)
    if pair == (1, 3):
        return (9, v) if v == w else (10, v)
    raise AssertionError(f"invalid NAF window {d0, d1, d2, d3}")


def canonical_limbs_to_le32(limbs: np.ndarray) -> np.ndarray:
    """Canonical Fr limbs int32[20, n] -> uint8[n, 32] LE records (vectorized).

    Limbs must be canonical (12-bit, non-negative) - i.e. fr.strong_normalize
    output or fr.from_int output.  No python-int round trips.
    """
    from dvpari_tpu.ops import fr

    return fr.limbs_to_le_bytes(limbs, 32)


def recode_scalars_bulk(limbs_canonical) -> "tuple[np.ndarray, np.ndarray]":
    """Canonical Fr limbs -> (idx int32[N_WINDOWS, n], sgn int32[N_WINDOWS, n]).

    Fast path through the native C++ recoder (~1us/scalar with OpenMP,
    replacing the ~245us/scalar pure-python path); mirrors the reference's
    choice to keep recoding native (inside xsk233_mul_frob,
    reference: src/curve.rs:113-137).  Falls back to recode_scalars.
    """
    import ctypes

    from dvpari_tpu import native

    arr = np.asarray(limbs_canonical)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[1]
    lib = native.load()
    if lib is None:
        ints = [
            sum(int(arr[i, j]) << (12 * i) for i in range(20)) for j in range(n)
        ]
        return recode_scalars(ints)
    recs = np.ascontiguousarray(canonical_limbs_to_le32(arr))
    idx8 = np.empty((n, N_WINDOWS), dtype=np.int8)
    sgn8 = np.empty((n, N_WINDOWS), dtype=np.int8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    bad = lib.dv_tnaf_recode_bulk(
        native._u8p(recs), n,
        idx8.ctypes.data_as(i8p), sgn8.ctypes.data_as(i8p),
    )
    assert bad == 0, f"{bad} scalars failed tau-NAF recoding"
    return idx8.T.astype(np.int32), sgn8.T.astype(np.int32)


def recode_masks_bulk(limbs_canonical) -> "tuple[np.ndarray, np.ndarray]":
    """Canonical Fr limbs -> bit-sliced ladder operands directly:
    (one-hot digit masks uint32[N_WINDOWS, 11, ceil32(n)], negative
    masks uint32[N_WINDOWS, ceil32(n)]).  Pads n to a multiple of 32
    with zero scalars (digit 0 = infinity entry).  Native fast path;
    falls back to recode + numpy packbits."""
    import ctypes

    from dvpari_tpu import native

    arr = np.asarray(limbs_canonical)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[1]
    npad = -n % 32
    lib = native.load()
    if lib is None or not hasattr(lib, "dv_tnaf_recode_masks"):
        from dvpari_tpu.ops.xsk233_bs import digit_masks

        idx, sgn = recode_scalars_bulk(arr)
        if npad:
            idx = np.concatenate(
                [idx, np.zeros((N_WINDOWS, npad), idx.dtype)], axis=-1
            )
            sgn = np.concatenate(
                [sgn, np.ones((N_WINDOWS, npad), sgn.dtype)], axis=-1
            )
        return digit_masks(idx, sgn)
    recs = np.zeros((n + npad, 32), dtype=np.uint8)
    recs[:n] = canonical_limbs_to_le32(arr)
    groups = (n + npad) // 32
    oh = np.empty((N_WINDOWS, TABLE_SIZE, groups), dtype=np.uint32)
    ng = np.empty((N_WINDOWS, groups), dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    bad = lib.dv_tnaf_recode_masks(
        native._u8p(recs), n + npad,
        oh.ctypes.data_as(u32p), ng.ctypes.data_as(u32p),
    )
    assert bad == 0, f"{bad} scalars failed tau-NAF recoding"
    return oh, ng


def recode_scalars(ks) -> "tuple[np.ndarray, np.ndarray]":
    """Scalars -> (table indices int32[N_WINDOWS, n], signs int32[N_WINDOWS, n]).

    Window w covers tau^(4w)..tau^(4w+3); the device ladder consumes
    windows MSB-first with acc = tau^4(acc) + sign * T[idx].
    """
    ks = list(ks)
    idx = np.zeros((N_WINDOWS, len(ks)), dtype=np.int32)
    sgn = np.ones((N_WINDOWS, len(ks)), dtype=np.int32)
    for j, k in enumerate(ks):
        c, d = partmod(int(k))
        digs = tnaf_digits(c, d, TNAF_LEN)
        for w in range(N_WINDOWS):
            d0, d1, d2, d3 = digs[4 * w : 4 * w + 4]
            t, s = _window_code(int(d0), int(d1), int(d2), int(d3))
            idx[w, j] = t
            sgn[w, j] = s
    return idx, sgn
