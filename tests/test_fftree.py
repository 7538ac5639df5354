"""FFTree (ECFFT engine) vs brute-force polynomial oracles.

Mirrors the reference's ec_fft property-test strategy: fast path vs
O(N^2) oracle at small N (reference: src/ec_fft.rs:628-1091,
test_compare_with_bruteforce / test_vanishing_poly /
test_interpolate_and_extend_match / test_subtree).
"""

import random

import jax.numpy as jnp
import pytest

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree.tree import FFTree

P = fr.P
N = 8  # domain |D| = |D'| = 8, tree2n has 16 leaves


def horner(cs, x):
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % P
    return acc


@pytest.fixture(scope="module")
def tree():
    return FFTree.build(2 * N, False, 4)


@pytest.fixture(scope="module")
def doms(tree):
    leaves = fr.to_int(tree.layers[0])
    return leaves, leaves[0::2], leaves[1::2]


def test_leaf_structure(tree, doms):
    leaves, D, Dp = doms
    assert len(set(leaves)) == 2 * N
    # subtree view = even leaves (reference: subtree_with_size semantics)
    assert fr.to_int(tree.leaves(1)) == D
    td = FFTree.build(2 * N, True, 4)
    assert fr.to_int(td.leaves(1)) == Dp  # interleaving property


def test_extend_both_moieties(tree, doms):
    _, D, Dp = doms
    rng = random.Random(21)
    cs = [rng.randrange(P) for _ in range(N)]
    evD = jnp.asarray(fr.from_int([horner(cs, x) for x in D]))
    assert fr.to_int(tree.extend(evD, "S1", 0)) == [horner(cs, x) for x in Dp]
    evDp = jnp.asarray(fr.from_int([horner(cs, x) for x in Dp]))
    assert fr.to_int(tree.extend(evDp, "S0", 0)) == [horner(cs, x) for x in D]
    # subtree view: D-evens -> D-odds
    cs4 = cs[: N // 2]
    evE = jnp.asarray(fr.from_int([horner(cs4, x) for x in D[0::2]]))
    assert fr.to_int(tree.extend(evE, "S1", 1)) == [
        horner(cs4, x) for x in D[1::2]
    ]


def test_enter_exit_roundtrip(tree, doms):
    leaves, D, _ = doms
    rng = random.Random(22)
    cs2n = [rng.randrange(P) for _ in range(2 * N)]
    ev = tree.enter(jnp.asarray(fr.from_int(cs2n)), 0)
    assert fr.to_int(ev) == [horner(cs2n, x) for x in leaves]
    assert fr.to_int(tree.exit(ev, 0)) == cs2n
    # depth-1 view
    cs = cs2n[:N]
    evd = tree.enter(jnp.asarray(fr.from_int(cs)), 1)
    assert fr.to_int(evd) == [horner(cs, x) for x in D]
    assert fr.to_int(tree.exit(evd, 1)) == cs


def test_vanishing_poly(tree, doms):
    # fast vanishing coeffs vs naive product of linear factors
    # (reference: test_vanishing_poly, src/ec_fft.rs:820-880)
    _, D, Dp = doms
    rng = random.Random(23)
    zc = fr.to_int(tree.z_coeffs(1))
    assert len(zc) == N + 1 and zc[-1] == 1
    tau = rng.randrange(P)
    prod = 1
    for x in D:
        prod = prod * (tau - x) % P
    assert horner(zc, tau) == prod
    assert all(horner(zc, x) == 0 for x in D)
    # vanish(): zero on S0, Z_D on S1 (reference: vanish + exit usage)
    vs = fr.to_int(tree.vanish_subdomain(0))
    assert all(v == 0 for v in vs[0::2])
    assert [v for v in vs[1::2]] == [horner(zc, x) for x in Dp]


def test_extend_matches_interpolation(tree, doms):
    # extend == interpolate-then-evaluate
    # (reference: test_interpolate_and_extend_match, src/ec_fft.rs:883-907)
    _, D, Dp = doms
    rng = random.Random(24)
    evals = [rng.randrange(P) for _ in range(N)]
    got = fr.to_int(tree.extend(jnp.asarray(fr.from_int(evals)), "S1", 0))
    # brute-force Lagrange interpolation onto D'
    for j, xq in enumerate(Dp):
        acc = 0
        for i, xi in enumerate(D):
            li = 1
            for k, xk in enumerate(D):
                if k != i:
                    li = li * (xq - xk) % P * pow(xi - xk, P - 2, P) % P
            acc = (acc + evals[i] * li) % P
        assert got[j] == acc


def test_device_build_matches_host():
    th = FFTree.build(2 * N, False, 4, device=False)
    td = FFTree.build(2 * N, False, 4, device=True)
    for lh, ld in zip(th.layers, td.layers):
        assert fr.to_int(lh) == fr.to_int(ld)


def _check_z_coeffs(z_int, dom):
    assert z_int[-1] == 1  # monic
    rng = random.Random(5)
    for d in rng.sample(dom, min(32, len(dom))):
        assert horner(z_int, d) == 0
    # spot value at x0 not in the domain
    x0 = 0xDEADBEEF
    expect = 1
    for d in dom:
        expect = expect * (x0 - d) % P
    assert horner(z_int, x0) == expect


def test_kronecker_z_coeffs_at_scale(monkeypatch):
    """The GMP Kronecker product tree (production path for large
    domains) must agree with direct evaluation: z(d) == 0 on sampled
    domain points, monic leading 1, and z(x0) == prod (x0 - d_i) at a
    point off the domain (python-int Horner oracle).  The host-int
    cutoff is shrunk so the Kronecker path runs at a CI-friendly size;
    scripts/zpoly_tpu.py drives it at 2^18 with the full enter-based
    domain check."""
    from dvpari_tpu.fftree import tree as tree_mod

    monkeypatch.setattr(tree_mod, "HOST_ZC_MAX", 256)
    n = 1024
    tree = FFTree.build(2 * n, False, 8)
    zc = tree.z_coeffs(1)  # kronecker product tree (n > patched cutoff)
    assert zc.shape[-1] == n + 1
    _check_z_coeffs(fr.to_int(zc), fr.to_int(tree.leaves(1)))


def test_kronecker_python_fallback(monkeypatch):
    """Same answers with libgmp unavailable (CPython int multiply)."""
    from dvpari_tpu.utils import kronecker

    monkeypatch.setattr(kronecker, "_gmp", None)
    monkeypatch.setattr(kronecker, "_gmp_tried", True)
    tree = FFTree.build(128, False, 4)
    dom = fr.to_int(tree.leaves(0))
    _check_z_coeffs(kronecker.vanishing_coeffs(dom, P), dom)


def test_vanish_arbitrary_subset():
    """vanish over an arbitrary (non-pow2, unordered) leaf subset: monic,
    zero exactly on the subset, correct degree, spot value off-domain."""
    tree = FFTree.build(64, False, 4)
    idx = [3, 17, 40, 5, 62, 31, 8]  # 7 leaves, unordered
    zc = fr.to_int(tree.vanish_coeffs_subset(idx))
    assert len(zc) == len(idx) + 1 and zc[-1] == 1
    dom = fr.to_int(tree.leaves(0))
    for j, dv in enumerate(dom):
        ev = horner(zc, dv)
        assert (ev == 0) == (j in idx), f"leaf {j}"
    x0 = 12345678901234567890
    expect = 1
    for i in idx:
        expect = expect * (x0 - dom[i]) % P
    assert horner(zc, x0) == expect


def test_device_z_coeffs_vs_host():
    """The level-synchronous device Karatsuba tree (fftree/polyops.py)
    still matches the host product tree at a small size (it is no
    longer the production path at scale -- the Kronecker tree is -- but
    remains the all-device option for moderate domains)."""
    import jax

    from dvpari_tpu.fftree.polyops import vanishing_poly_coeffs
    from dvpari_tpu.fftree.tree import _host_vanishing_coeffs

    tree = FFTree.build(1024, False, 8)
    leaves = tree.leaves(1)  # 512 points
    got = fr.to_int(jax.jit(vanishing_poly_coeffs)(leaves))
    assert got == _host_vanishing_coeffs(fr.to_int(leaves))


def test_poly_eval_matches_horner_large():
    # fr.poly_eval switches to the log-depth powers+dot form above n=64;
    # exercise both sides of the threshold against the python oracle
    rng = random.Random(31)
    x = rng.randrange(P)
    xd = jnp.asarray(fr.from_int(x))
    for n in (17, 64, 65, 200):
        cs = [rng.randrange(P) for _ in range(n)]
        got = fr.to_int(fr.poly_eval(jnp.asarray(fr.from_int(cs)), xd))
        assert got == horner(cs, x), n


def test_barycentric_eval3_matches_single(tree, doms):
    # the fused three-poly eval (shared Z(alpha) + shared batch
    # inversion) must agree with three independent barycentric evals,
    # and its diff_inv output must be 1/(alpha - d_i)
    from dvpari_tpu.fftree import precompute as pre

    _, D, _ = doms
    rng = random.Random(32)
    z = tree.z_coeffs(1)
    bw = pre.compute_barycentric_weights(tree, z, 1)
    dom = tree.leaves(1)
    alpha = rng.randrange(P)
    ad = jnp.asarray(fr.from_int(alpha))
    polys = [[rng.randrange(P) for _ in range(N)] for _ in range(3)]
    devs = [jnp.asarray(fr.from_int(p)) for p in polys]
    a0, b0, i0, dinv = pre.barycentric_eval3_at_alpha(
        dom, bw, z, devs[0], devs[1], devs[2], ad
    )
    for got, p in zip((a0, b0, i0), devs):
        want = pre.barycentric_eval_at_alpha(dom, bw, z, p, ad)
        assert fr.to_int(got) == fr.to_int(want)
    assert fr.to_int(dinv) == [pow(alpha - d, P - 2, P) for d in D]


def test_device_build_chunked_layer0_matches_host(monkeypatch):
    # the size-independent chunked layer-0 ladder (offset-as-argument,
    # fixed _LADDER_STEPS masked steps) must build the same tree as the
    # host path; shrink the chunk width so a 32-leaf build exercises
    # multiple chunks and the masked pad steps
    from dvpari_tpu.fftree import device_build as db

    monkeypatch.setenv("DVPARI_LAYER0_CHUNK", "8")
    monkeypatch.setattr(db, "_layer0_chunk_jit", None)
    th = FFTree.build(2 * N, False, 4, device=False)
    td = FFTree.build(2 * N, False, 4, device=True)
    for lh, ld in zip(th.layers, td.layers):
        assert fr.to_int(lh) == fr.to_int(ld)
