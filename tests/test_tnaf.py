"""tau-adic NAF recoding properties (host side)."""

import random

import numpy as np

from dvpari_tpu.ops import tnaf
from dvpari_tpu.utils import gf2_host as gh, xsk233_host as host


def tau(p):
    if p is None:
        return None
    return (gh.square_int(p[0]), gh.square_int(p[1]))


def test_delta_annihilates_subgroup():
    # N(delta) == r means delta kills the prime subgroup
    assert tnaf.N_DELTA == host.R


def test_tnaf_reconstructs_scalar_mul():
    rng = random.Random(42)
    G = (host.GX, host.GY)
    for _ in range(3):
        k = rng.randrange(1, host.R)
        c, d = tnaf.partmod(k)
        digs = tnaf.tnaf_digits(c, d, tnaf.TNAF_LEN)
        # non-adjacency
        assert all(digs[i] == 0 or digs[i + 1] == 0 for i in range(len(digs) - 1))
        acc = None
        for i in range(tnaf.TNAF_LEN - 1, -1, -1):
            acc = tau(acc)
            if digs[i] == 1:
                acc = host.add(acc, G)
            elif digs[i] == -1:
                acc = host.add(acc, host.neg(G))
        assert acc == host.smul(k, G)


def test_native_bulk_recode_matches_python():
    # the C++ bulk recoder (dv_tnaf_recode_bulk) must agree with the
    # pure-python partmod + tau-NAF + window path on random scalars
    from dvpari_tpu.ops import fr

    rng = random.Random(7)
    ks = [0, 1, 2, host.R - 1, host.R] + [
        rng.randrange(host.R) for _ in range(64)
    ]
    limbs = fr.from_int(ks)
    idx_b, sgn_b = tnaf.recode_scalars_bulk(limbs)
    idx_p, sgn_p = tnaf.recode_scalars(ks)
    assert (idx_b == idx_p).all()
    # sign only matters where the window is nonzero
    nz = idx_p != 0
    assert (sgn_b[nz] == sgn_p[nz]).all()


def test_recode_window_codes():
    idx, sgn = tnaf.recode_scalars([0, 1, host.R])
    assert idx.shape == (tnaf.N_WINDOWS, 3)
    # k=0 -> all zero windows; k=r == 0 in the subgroup -> partmod gives 0
    assert (idx[:, 0] == 0).all()
    assert set(np.unique(sgn)) <= {-1, 1}
    assert idx.max() < tnaf.TABLE_SIZE
