"""Bit-sliced GF(2^233) + group-law engine vs the host/word-sliced oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvpari_tpu.ops import gf2bs as F
from dvpari_tpu.ops import xsk233_bs as bs
from dvpari_tpu.ops import xsk233, tnaf
from dvpari_tpu.utils import gf2_host as gh
from dvpari_tpu.utils import xsk233_host as host

RNG = np.random.default_rng(777)


def rand_elems(n):
    return [int.from_bytes(RNG.bytes(30), "little") >> 7 for _ in range(n)]


def test_pack_roundtrip():
    vals = rand_elems(64)
    planes = F.from_int(vals)
    assert planes.shape == (233, 2)
    back = F.to_int(planes)
    assert back[:64] == vals


def test_field_ops_vs_host():
    a_int = rand_elems(32)
    b_int = rand_elems(32)
    a, b = jnp.asarray(F.from_int(a_int)), jnp.asarray(F.from_int(b_int))
    got_mul = F.to_int(F.mul(a, b))
    got_sqr = F.to_int(F.square(a))
    got_add = F.to_int(F.add(a, b))
    for j in range(32):
        assert got_mul[j] == gh.mul_int(a_int[j], b_int[j])
        assert got_sqr[j] == gh.square_int(a_int[j])
        assert got_add[j] == a_int[j] ^ b_int[j]


def test_mul_impls_agree():
    """Both multiply formulations (skew diagonal-reduction and concat
    window-accumulate) match the host oracle bit-for-bit."""
    a_int = rand_elems(32)
    b_int = rand_elems(32)
    a, b = jnp.asarray(F.from_int(a_int)), jnp.asarray(F.from_int(b_int))
    prev = F.MUL_IMPL
    try:
        results = {}
        for impl in ("skew", "concat"):
            F.MUL_IMPL = impl
            results[impl] = F.to_int(F.mul(a, b))
    finally:
        F.MUL_IMPL = prev
    for j in range(32):
        want = gh.mul_int(a_int[j], b_int[j])
        assert results["skew"][j] == results["concat"][j] == want


def test_field_inv():
    a_int = rand_elems(32)
    a_int[0] = 0  # inv(0) = 0 convention
    a = jnp.asarray(F.from_int(a_int))
    got = F.to_int(F.inv(a))
    for j in range(32):
        expect = 0 if a_int[j] == 0 else gh.inv_int(a_int[j])
        assert got[j] == expect


def test_is_zero_mask():
    vals = rand_elems(32)
    vals[3] = 0
    vals[17] = 0
    m = np.asarray(F.is_zero_mask(jnp.asarray(F.from_int(vals))))
    expect = sum(1 << j for j, v in enumerate(vals) if v == 0)
    assert int(m[0]) == expect


def _rand_points(n):
    ks = [int.from_bytes(RNG.bytes(28), "little") % host.R for _ in range(n)]
    return [host.smul(k, (host.GX, host.GY)) for k in ks]


def test_group_add_vs_host():
    pts_p = _rand_points(8)
    pts_q = _rand_points(8)
    # include the degenerate cases: doubling, inverse, infinity both sides
    pts_p += [pts_p[0], pts_p[1], None, pts_p[2], None]
    pts_q += [pts_p[0], host.neg(pts_p[1]), pts_q[0], None, None]
    n = len(pts_p)
    P = bs.pack_points(np.asarray(xsk233.from_affine_int(pts_p)))
    Q = bs.pack_points(np.asarray(xsk233.from_affine_int(pts_q)))
    R = bs.add(jnp.asarray(P), jnp.asarray(Q))
    for j in range(n):
        got = _to_affine(np.asarray(R), j)
        assert got == host.add(pts_p[j], pts_q[j]), f"slot {j}"


def _to_affine(planes, slot):
    # planes (3, 233, C): pick column slot//32, bit slot%32
    col = planes[..., slot // 32]
    pt = bs.extract_point(col, slot % 32)
    x, y, z = (
        sum(int(pt[0, i]) << (32 * i) for i in range(8)),
        sum(int(pt[1, i]) << (32 * i) for i in range(8)),
        sum(int(pt[2, i]) << (32 * i) for i in range(8)),
    )
    if z == 0:
        return None
    zi = gh.inv_int(z)
    return (gh.mul_int(x, zi), gh.mul_int(y, zi))


def test_frobenius_and_double():
    pts = _rand_points(4)
    P = jnp.asarray(bs.pack_points(np.asarray(xsk233.from_affine_int(pts))))
    D = np.asarray(bs.double(P))
    T = np.asarray(bs.frobenius(P))
    for j, p in enumerate(pts):
        assert _to_affine(D, j) == host.add(p, p)
        tx, ty = gh.pow2k_int(p[0], 1), gh.pow2k_int(p[1], 1)
        assert _to_affine(T, j) == (tx, ty)


def test_mulgen_fixed_base_vs_host():
    """Bit-sliced fixed-base batch [k_i]G (XLA path: broadcast G window
    table + per-slot ladder, no fold) vs the host oracle, through the
    same digit-mask packing the Pallas mulgen consumes."""
    import jax

    from dvpari_tpu.ops import fr

    n = 40  # exercises zero-padding to 64 slots
    ks = [int.from_bytes(RNG.bytes(28), "little") % host.R for _ in range(n)]
    ks[7] = 0  # zero scalar -> infinity
    oh, ng = tnaf.recode_masks_bulk(np.asarray(fr.from_int(ks)))
    planes = bs.mulgen_packed(
        jnp.asarray(oh), jnp.asarray(ng), jnp.asarray(xsk233._gen_table_planes())
    )
    planes_np = np.asarray(jax.device_get(planes))
    words = bs.unpack_points(planes_np)
    assert words.shape == (3, 8, 64)
    for j in range(n):
        expect = host.smul(ks[j], (host.GX, host.GY)) if ks[j] else None
        assert _to_affine(planes_np, j) == expect, f"slot {j}"
    # padded slots are infinity
    for j in range(n, 64):
        assert _to_affine(planes_np, j) is None


@pytest.mark.skipif(
    not __import__("os").environ.get("DVPARI_SLOW_TESTS"),
    reason="~8 min CPU compile (word-sliced oracle); set DVPARI_SLOW_TESTS=1",
)
def test_msm_chunked_pipeline(monkeypatch):
    """The chunked (pipelined) bit-sliced MSM orchestration -- column
    slicing, ragged tail, per-chunk recode, fold_cols combine -- must
    reproduce the word-sliced MSM exactly.  The Pallas kernel itself is
    TPU-validated; here it is stood in by the XLA bit-sliced core so the
    host logic runs on CPU."""
    import jax
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops import pallas_msm

    monkeypatch.setattr(
        pallas_msm, "msm_packed", lambda oh, ng, p: bs.msm_packed(oh, ng, p)
    )
    monkeypatch.setenv("DVPARI_MSM_CHUNK_COLS", "2")  # 64-point chunks
    n = 150  # 3 chunks: 64 + 64 + ragged 22
    ks = [int.from_bytes(RNG.bytes(28), "little") % host.R for k in range(n)]
    pts = _rand_points(n)
    points = jnp.asarray(np.asarray(xsk233.from_affine_int(pts)))
    scalars = jnp.asarray(fr.from_int(ks))
    got = np.asarray(
        jax.device_get(xsk233._msm_limbs_bitsliced(scalars, points))
    )
    idx, sgn = xsk233.recode_limbs(scalars)
    expect = np.asarray(jax.device_get(xsk233.msm_frob_jit(idx, sgn, points)))
    got_aff = xsk233.to_affine_int(jnp.asarray(got))
    expect_aff = xsk233.to_affine_int(jnp.asarray(expect))
    assert got_aff == expect_aff and expect_aff is not None


def test_mulgen_chunked_ragged_tail(monkeypatch):
    """Chunked fixed-base mulgen with a ragged final chunk (regression:
    the tail's column count was floor- instead of ceil-divided, silently
    dropping up to 31 points).  Pallas entry stubbed with the XLA
    mulgen; DVPARI_MSM_IMPL=bs forces the chunked path on CPU."""
    import jax
    from dvpari_tpu.ops import fr
    from dvpari_tpu.ops import pallas_msm

    monkeypatch.setattr(
        pallas_msm, "mulgen_packed", lambda oh, ng, tab: bs.mulgen_packed(oh, ng, tab)
    )
    monkeypatch.setenv("DVPARI_MSM_IMPL", "bs")
    monkeypatch.setenv("DVPARI_MSM_CHUNK_COLS", "2")  # 64-point chunks
    n = 150  # chunks: 64 + 64 + ragged 22 (non-multiple of 32)
    ks = [int.from_bytes(RNG.bytes(28), "little") % host.R for _ in range(n)]
    ks[100] = 0
    out = xsk233.mulgen_limbs(jnp.asarray(fr.from_int(ks)))
    assert out.shape == (3, 8, n)
    got = xsk233.to_affine_int(out)
    for j in (0, 63, 64, 99, 100, 127, 128, 149):  # chunk edges + tail
        expect = host.smul(ks[j], (host.GX, host.GY)) if ks[j] else None
        assert got[j] == expect, f"slot {j}"


@pytest.mark.parametrize("n", [5, 32, 70])
def test_msm_vs_wordsliced(n):
    ks = [int.from_bytes(RNG.bytes(28), "little") % host.R for _ in range(n)]
    pts = _rand_points(n)
    idx, sgn = tnaf.recode_scalars(ks)
    points = np.asarray(xsk233.from_affine_int(pts))
    got = bs.msm_words(idx, sgn, points)
    x = sum(int(got[0, i]) << (32 * i) for i in range(8))
    y = sum(int(got[1, i]) << (32 * i) for i in range(8))
    z = sum(int(got[2, i]) << (32 * i) for i in range(8))
    expect = None
    for k, p in zip(ks, pts):
        expect = host.add(expect, host.smul(k, p))
    if z == 0:
        assert expect is None
    else:
        zi = gh.inv_int(z)
        assert (gh.mul_int(x, zi), gh.mul_int(y, zi)) == expect


@pytest.mark.slow
def test_pallas_msm_interpret_vs_host():
    """The PRODUCTION Pallas ladder kernel (ops/pallas_msm.py) run in
    pallas interpret mode on CPU vs the host oracle: pins the kernel's
    logic (fori ladder, table masking, cneg, VMEM-narrow multiply
    toggles) in CI without TPU hardware.  c_tile=2 keeps the interpreted
    tile small; on hardware the tile is 128 (last block dim rule).
    ~3 min (interpret-mode cost of 62 windows x 233-pass multiplies) --
    slow tier; full CI mode (DVPARI_SLOW_TESTS=1) exercises the
    production kernel's code path, not just its traced jnp twin."""
    import jax

    from dvpari_tpu.ops import pallas_msm

    n = 40
    ks = [int.from_bytes(RNG.bytes(28), "little") % host.R for _ in range(n)]
    pts = _rand_points(n)
    idx, sgn = tnaf.recode_scalars(ks)
    pad = -n % 32
    idx = np.concatenate([idx, np.zeros((tnaf.N_WINDOWS, pad), idx.dtype)], axis=-1)
    sgn = np.concatenate([sgn, np.ones((tnaf.N_WINDOWS, pad), sgn.dtype)], axis=-1)
    oh, ng = bs.digit_masks(np.asarray(idx), np.asarray(sgn))
    pbs = bs.pack_points(np.asarray(xsk233.from_affine_int(pts)))
    res = pallas_msm.msm_packed(
        jnp.asarray(oh), jnp.asarray(ng), jnp.asarray(pbs),
        c_tile=2, interpret=True,
    )
    got = bs.extract_point(np.asarray(jax.device_get(res)), 0)
    expect = None
    for k, p in zip(ks, pts):
        expect = host.add(expect, host.smul(k, p))
    x = sum(int(got[0, i]) << (32 * i) for i in range(8))
    y = sum(int(got[1, i]) << (32 * i) for i in range(8))
    z = sum(int(got[2, i]) << (32 * i) for i in range(8))
    zi = gh.inv_int(z)
    assert (gh.mul_int(x, zi), gh.mul_int(y, zi)) == expect
