"""Device-side tau-NAF recode (ops/tnaf_device.py) vs the host oracle.

Device digits may legitimately differ from the host recoder's (the
Barrett partmod can land on a neighbouring quotient, see the module
docstring), so the tests check the algebra, not the digit bytes:
 * reconstruction: sum u_i tau^i == k (mod DELTA) with exact python ints;
 * window codes decode back to the same Z[tau] value;
 * mask packing bit-identical to xsk233_bs.digit_masks on the same codes;
 * end-to-end: fused ladder (interpret mode) on device-recoded masks ==
   host scalar multiplication oracle.

(reference recode oracle: tau-NAF inside xsk233_mul_frob,
src/curve.rs:113-137.)
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from dvpari_tpu.ops import fr
from dvpari_tpu.ops import tnaf
from dvpari_tpu.ops import tnaf_device as tdev


def _k_batch(n, seed=11):
    rng = random.Random(seed)
    ks = [rng.randrange(0, tnaf.N_DELTA) for _ in range(n - 3)]
    # edge scalars: 0 and 1 and r-1 (zero pads must recode to infinity)
    ks += [0, 1, tnaf.N_DELTA - 1]
    return ks


def _divisible_by_delta(a, b):
    """(a + b tau) % DELTA == 0 in Z[tau], exact ints."""
    num = tnaf._zt_mul((a, b), tnaf._zt_conj(tnaf.DELTA))
    return num[0] % tnaf.N_DELTA == 0 and num[1] % tnaf.N_DELTA == 0


def test_digits_reconstruct_mod_delta():
    ks = _k_batch(64)
    canon = jnp.asarray(fr.from_int(ks))
    c, d = tdev._partmod_limbs(canon)
    digits, ok = tdev._tnaf_scan(c, d)
    assert bool(np.all(np.asarray(ok))), "scan left a nonzero residue"
    digits = np.asarray(digits)
    for j, k in enumerate(ks):
        a, b = tdev.reconstruct_zt(digits[:, j])
        assert _divisible_by_delta(k - a, -b), f"scalar {j} reconstructs wrong"
        # digits are a valid NAF: no two adjacent nonzeros
        dj = digits[:, j]
        assert not np.any((dj[:-1] != 0) & (dj[1:] != 0)), f"adjacency {j}"


def test_window_codes_decode_and_masks_bitexact():
    ks = _k_batch(64, seed=5)
    canon = jnp.asarray(fr.from_int(ks))
    c, d = tdev._partmod_limbs(canon)
    digits, _ = tdev._tnaf_scan(c, d)
    idx, sgn, valid = tdev._window_codes(digits)
    assert bool(np.all(np.asarray(valid)))
    idx_np, sgn_np = np.asarray(idx), np.asarray(sgn)
    # table entries as (a, b tau) pairs: decode idx/sgn back to Z[tau]
    T = {0: (0, 0), 1: (1, 0), 2: (0, 1)}
    t2 = tnaf._zt_mul((0, 1), (0, 1))
    t3 = tnaf._zt_mul(t2, (0, 1))
    T[3], T[4] = t2, t3
    T[5] = (1 + t2[0], t2[1])
    T[6] = (1 - t2[0], -t2[1])
    T[7] = (1 + t3[0], t3[1])
    T[8] = (1 - t3[0], -t3[1])
    T[9] = (t3[0], 1 + t3[1])
    T[10] = (-t3[0], 1 - t3[1])
    digits_np = np.asarray(digits)
    for j in range(len(ks)):
        val = (0, 0)
        for w in reversed(range(tnaf.N_WINDOWS)):
            for _ in range(4):
                val = tnaf._zt_mul(val, (0, 1))
            e = T[int(idx_np[w, j])]
            s = int(sgn_np[w, j])
            val = (val[0] + s * e[0], val[1] + s * e[1])
        a, b = tdev.reconstruct_zt(digits_np[:, j])
        assert val == (a, b), f"window decode mismatch scalar {j}"
    # mask packing: bit-identical to the host packer on the same codes
    from dvpari_tpu.ops.xsk233_bs import digit_masks

    oh_h, ng_h = digit_masks(idx_np.astype(np.int32), sgn_np.astype(np.int32))
    oh_d, ng_d, ok = tdev.recode_masks_jit(canon)
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(oh_d), oh_h)
    assert np.array_equal(np.asarray(ng_d), ng_h)


def test_msm_chunked_device_recode_vs_host_oracle(monkeypatch):
    """The production chunked MSM with ON-DEVICE recoding (xsk233.py:
    _msm_device_recoded): dynamic-slice chunking, per-chunk recode +
    ladder, on-chip fold -- against the host oracle.  Pallas entry
    stubbed with the XLA twin; ragged tail + a zero scalar included."""
    from dvpari_tpu.ops import pallas_msm, xsk233
    from dvpari_tpu.ops import xsk233_bs as bs
    from dvpari_tpu.utils import gf2_host as gh
    from dvpari_tpu.utils import xsk233_host as host

    monkeypatch.setattr(pallas_msm, "msm_packed", bs.msm_packed)
    monkeypatch.setenv("DVPARI_MSM_IMPL", "bs")
    monkeypatch.setenv("DVPARI_RECODE", "device")
    monkeypatch.setenv("DVPARI_MSM_CHUNK_COLS", "2")  # 64-point chunks
    # recode width is no longer clamped to the MSM size (one compile
    # key for all sizes); pin it small so the CPU test doesn't scan a
    # 131k-lane zero-padded batch
    monkeypatch.setenv("DVPARI_RECODE_COLS", "4")
    rng = random.Random(23)
    n = 150  # chunks: 64 + 64 + ragged 22 (non-multiple of 32)
    ks = [rng.randrange(0, host.R) for _ in range(n)]
    ks[100] = 0
    pts_aff = []
    pw = (host.GX, host.GY)
    for _ in range(n):
        pw = host.smul(rng.randrange(2, 1000), pw)
        pts_aff.append(pw)
    points = xsk233.from_affine_int(pts_aff)
    out = xsk233.msm_limbs(jnp.asarray(fr.from_int(ks)), points)
    expect = None
    for k, p in zip(ks, pts_aff):
        expect = host.add(expect, host.smul(k, p))
    got = np.asarray(out)
    X, Y, Z = [
        sum(int(got[c, i]) << (32 * i) for i in range(8)) for c in range(3)
    ]
    zi = gh.inv_int(Z)
    assert (gh.mul_int(X, zi), gh.mul_int(Y, zi)) == expect


@pytest.mark.slow
def test_msm_interpret_matches_host_oracle(no_persistent_compile_cache):
    """Fused ladder (interpret mode) on device-recoded masks == host smul."""
    from dvpari_tpu.ops import pallas_msm, xsk233
    from dvpari_tpu.ops import xsk233_bs as bs
    from dvpari_tpu.utils import xsk233_host as host

    n = 32
    ks = _k_batch(n, seed=9)
    canon = jnp.asarray(fr.from_int(ks))
    oh, ng, ok = tdev.recode_masks_jit(canon)
    assert bool(np.asarray(ok))
    pts = jnp.broadcast_to(xsk233.generator().reshape(3, 8, 1), (3, 8, n))
    planes = jnp.asarray(bs.pack_points(np.asarray(pts)))
    res = pallas_msm.msm_packed(oh, ng, planes, interpret=True)
    got = bs.extract_point(res, 0)
    want = host.smul(sum(ks) % host.R, (host.GX, host.GY))
    from dvpari_tpu.utils import gf2_host as gh

    X, Y, Z = [
        sum(int(got[c, i]) << (32 * i) for i in range(8)) for c in range(3)
    ]
    zi = gh.inv_int(Z)
    assert (gh.mul_int(X, zi), gh.mul_int(Y, zi)) == want


def test_mulgen_device_recode_vs_host_oracle(monkeypatch):
    """The fan-out path with ON-DEVICE recoding (xsk233.py:
    _mulgen_bs_device): wide-batch recode, dynamic-slice ladder chunks,
    pipelined host drain -- vs host smul of G.  Pallas entry stubbed
    with the XLA twin; ragged tail (n % 32 != 0), zero scalar, and a
    recode batch spanning two ladder chunks all exercised.  Checks both
    returned layouts (proj words and bit planes) agree."""
    import random

    from dvpari_tpu.ops import pallas_msm, xsk233
    from dvpari_tpu.ops import xsk233_bs as bs
    from dvpari_tpu.utils import xsk233_host as host

    monkeypatch.setattr(
        pallas_msm,
        "mulgen_packed",
        lambda oh, ng, tab: bs.mulgen_packed(oh, ng, tab),
    )
    monkeypatch.setenv("DVPARI_MSM_IMPL", "bs")
    monkeypatch.setenv("DVPARI_RECODE", "device")
    monkeypatch.setenv("DVPARI_MSM_CHUNK_COLS", "2")  # 64-point chunks
    monkeypatch.setenv("DVPARI_RECODE_COLS", "4")  # 2 chunks per batch
    rng = random.Random(31)
    n = 150  # chunks: 64 + 64 + ragged 22 (non-multiple of 32)
    ks = [rng.randrange(0, host.R) for _ in range(n)]
    ks[100] = 0
    proj, planes = xsk233.mulgen_limbs_host(jnp.asarray(fr.from_int(ks)))
    assert proj.shape == (3, 8, n) and planes.shape[-1] == -(-n // 32)
    np.testing.assert_array_equal(
        bs.unpack_points(planes)[..., :n], proj
    )
    got = xsk233.to_affine_int(jnp.asarray(proj))
    for j in (0, 63, 64, 99, 100, 127, 128, 149):  # chunk edges + tail
        expect = host.smul(ks[j], (host.GX, host.GY)) if ks[j] else None
        assert got[j] == expect, f"slot {j}"
