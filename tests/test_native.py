"""Native (C++) host backend vs the python-int oracle.

The native library plays the role of the reference's xs233 C layer for
host-side work (bulk codec, batched affine); the TPU kernels remain the
compute path and both must agree bit-exactly.
"""

import random

import numpy as np
import pytest

from dvpari_tpu import native
from dvpari_tpu.utils import gf2_host as gh, xsk233_host as host

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend unavailable"
)


def test_field_ops_match_oracle():
    lib = native.load()
    rng = random.Random(17)
    out = np.zeros(4, np.uint64)
    for _ in range(10):
        a = gh.reduce_int(rng.getrandbits(233))
        b = gh.reduce_int(rng.getrandbits(233))
        A, B = native.fe_int_to_words(a), native.fe_int_to_words(b)
        lib.dv_fe_mul(native._u64p(A), native._u64p(B), native._u64p(out))
        assert native.fe_words_to_int(out) == gh.mul_int(a, b)
        lib.dv_fe_inv(native._u64p(A), native._u64p(out))
        assert native.fe_words_to_int(out) == gh.inv_int(a)
        assert lib.dv_fe_trace(native._u64p(A)) == gh.trace_fast_int(a)
        lib.dv_fe_halftrace(native._u64p(A), native._u64p(out))
        assert native.fe_words_to_int(out) == gh.halftrace_int(a)


def test_codec_matches_python():
    rng = random.Random(18)
    pts = [host.smul(rng.randrange(1, host.R), (host.GX, host.GY)) for _ in range(6)]
    pts.append(None)
    enc_py = b"".join(host.encode(p) for p in pts)
    xy, inf = native.decode_bulk(enc_py)
    for i, p in enumerate(pts):
        if p is None:
            assert inf[i] == 1
        else:
            assert native.fe_words_to_int(xy[i, :4]) == p[0]
            assert native.fe_words_to_int(xy[i, 4:]) == p[1]
    assert native.encode_bulk(xy, inf) == enc_py


def test_pt_smul_matches_oracle():
    """Native scalar-mul (the verifier's hot path) vs the python ladder."""
    rng = random.Random(19)
    G = (host.GX, host.GY)
    P = host.smul(rng.randrange(1, host.R), G)
    for k in [1, 2, 3, rng.randrange(1, host.R), host.R - 1]:
        assert host.smul_fast(k, P) == host.smul(k, P)
    assert host.smul_fast(0, P) is None
    assert host.smul_fast(host.R, P) is None  # order * P = infinity
    assert host.smul_fast(7, None) is None


def test_pt_decode_single_matches_oracle():
    """Native single-record decode (verifier path) vs the python decode,
    including the validity contract on malformed records."""
    rng = random.Random(20)
    G = (host.GX, host.GY)
    for _ in range(3):
        p = host.smul(rng.randrange(1, host.R), G)
        enc = host.encode(p)
        assert host.decode_fast(enc) == host.decode(enc) == (p, True)
    assert host.decode_fast(bytes(30)) == (None, True)  # infinity
    bad = bytearray(host.encode(G))
    bad[29] |= 0xFC  # high padding bits set
    assert host.decode_fast(bytes(bad)) == (None, False)
    x_one = (1).to_bytes(30, "little")  # fails the trace solvability check
    assert host.decode_fast(x_one) == host.decode(x_one)


def test_codec_rejections():
    p = host.smul(12345, (host.GX, host.GY))
    bad = bytearray(host.encode(p))
    bad[29] |= 0x80
    with pytest.raises(ValueError):
        native.decode_bulk(bytes(bad))
    # P + 2-torsion: on curve but outside the prime subgroup
    with pytest.raises(ValueError):
        native.decode_bulk(host.encode(host.add(p, (0, 1))))


def test_point_vec_artifact_roundtrip(tmp_path):
    import jax.numpy as jnp
    from dvpari_tpu.ops import xsk233
    from dvpari_tpu.storage import artifacts as art

    rng = random.Random(19)
    pts = [host.smul(rng.randrange(1, host.R), (host.GX, host.GY)) for _ in range(5)]
    pts.append(None)
    batch = xsk233.from_affine_int(pts)
    path = str(tmp_path / "g_test")
    art.write_point_vec(path, batch)
    back = art.read_point_vec(path)
    assert xsk233.to_affine_int(back) == pts
    # without sidecar (decode path)
    import os

    os.remove(path + ".fast.npz")
    back2 = art.read_point_vec(path)
    assert xsk233.to_affine_int(back2) == pts


def test_sidecar_integrity_recovers(tmp_path):
    """A corrupt/stale sidecar must be detected via the SRC digest and
    re-derived from the 30-byte records (reference validates every point
    on read, src/io_utils.rs:217-226; sidecars are derived caches)."""
    import os

    import jax.numpy as jnp
    import numpy as np
    from dvpari_tpu.ops import xsk233
    from dvpari_tpu.storage import artifacts as art

    rng = random.Random(21)
    pts = [host.smul(rng.randrange(1, host.R), (host.GX, host.GY)) for _ in range(5)]
    batch = xsk233.from_affine_int(pts)
    path = str(tmp_path / "g_bad")
    art.write_point_vec(path, batch)

    # corrupt the fast sidecar payload in place (SELF digest catches it)
    z = dict(np.load(path + ".fast.npz"))
    z["X"] = z["X"] ^ np.uint32(0xDEAD)
    np.savez(path + ".fast.npz", **z)
    back = art.read_point_vec(path)
    assert xsk233.to_affine_int(back) == pts  # healed from records
    healed = np.load(path + ".fast.npz")
    assert art._sidecar_fresh(path, healed)

    # a sidecar whose digest doesn't match the record file is also stale
    z2 = dict(np.load(path + ".fast.npz"))
    z2["SRC"] = z2["SRC"] ^ np.uint8(1)
    np.savez(path + ".fast.npz", **z2)
    assert not art._sidecar_fresh(path, np.load(path + ".fast.npz"))
    back2 = art.read_point_vec(path)
    assert xsk233.to_affine_int(back2) == pts

    # legacy sidecar (no SRC key): treated as stale, re-derived
    z3 = dict(np.load(path + ".fast.npz"))
    z3.pop("SRC")
    np.savez(path + ".fast.npz", **z3)
    back3 = art.read_point_vec(path)
    assert xsk233.to_affine_int(back3) == pts
    assert art._sidecar_fresh(path, np.load(path + ".fast.npz"))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_zpoly_native_vs_ctypes_tree():
    """The native OpenMP Kronecker product tree (zpoly_native.cpp) must
    match the ctypes/GMP tree coefficient-for-coefficient, including
    odd node counts and zero domain elements."""
    from dvpari_tpu.utils import kronecker

    lib = native.load()
    if not hasattr(lib, "dv_zpoly_coeffs"):
        pytest.skip("zpoly entry not in this .so build")
    P = 3450873173395281893717377931138512760570940988862252126328087024741343
    rng = random.Random(23)
    for n in (1, 2, 3, 64, 67, 200):
        dom = [rng.randrange(P) for _ in range(n)]
        if n >= 3:
            dom[1] = 0
        got = kronecker._vanishing_coeffs_native(dom, P)
        assert got is not None
        expect_nodes = [(kronecker._pack([(P - d) % P, 1]), 1) for d in dom]
        while len(expect_nodes) > 1:
            nxt = []
            for i in range(0, len(expect_nodes) - 1, 2):
                (da, ma), (db, mb) = expect_nodes[i], expect_nodes[i + 1]
                m = ma + mb
                prod = kronecker._mul_bytes(da, db, kronecker.PAD_BYTES * (m + 2))
                nxt.append(
                    (kronecker._pack(kronecker._unpack_reduce(prod, m + 1, P)), m)
                )
            if len(expect_nodes) % 2:
                nxt.append(expect_nodes[-1])
            expect_nodes = nxt
        expect = kronecker._unpack_reduce(expect_nodes[0][0], n + 1, P)
        assert got == expect, f"n={n}"
        # spot property: z(d_i) == 0 for a sampled domain point
        d = dom[0]
        acc = 0
        for c in reversed(expect):
            acc = (acc * d + c) % P
        assert acc == 0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_zpoly_limbs_path_matches_int_path():
    """vanishing_coeffs_limbs (vectorized byte conversion both ends)
    must equal the int-level tree on the same domain, including loose
    (non-canonical) input limbs."""
    import jax.numpy as jnp

    from dvpari_tpu.ops import fr
    from dvpari_tpu.utils import kronecker

    lib = native.load()
    if not hasattr(lib, "dv_zpoly_coeffs"):
        pytest.skip("zpoly entry not in this .so build")
    rng = random.Random(29)
    dom = [rng.randrange(fr.P) for _ in range(150)]
    limbs = jnp.asarray(fr.from_int(dom)) + jnp.asarray(fr.from_int(dom))  # loose 2d
    two_dom = [2 * d % fr.P for d in dom]
    got = kronecker.vanishing_coeffs_limbs(limbs)
    assert got is not None
    expect = kronecker.vanishing_coeffs(two_dom, fr.P)
    assert fr.to_int(got) == expect
