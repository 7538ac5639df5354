"""sect233k1 batched group law / scalar-mul / MSM vs the host oracle.

Mirrors the reference's curve unit tests: scalar-mul linearity and MSM
vs sum-then-mul (reference: src/curve.rs:196-232), point serialization
round trip (src/curve.rs:236-248), plus masked-completeness edge cases
the reference gets from xs233's complete formulas.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpari_tpu.ops import xsk233 as curve
from dvpari_tpu.utils import xsk233_host as host

N = 6


@pytest.fixture(scope="module")
def pts():
    rng = random.Random(11)
    ks = [rng.randrange(1, host.R) for _ in range(N)]
    Ps = [host.smul(k, (host.GX, host.GY)) for k in ks]
    Qs = [host.smul(rng.randrange(1, host.R), (host.GX, host.GY)) for _ in range(N)]
    return ks, Ps, Qs, curve.from_affine_int(Ps), curve.from_affine_int(Qs)


def test_add_and_double(pts):
    ks, Ps, Qs, P, Q = pts
    assert curve.to_affine_int(jax.jit(curve.add)(P, Q)) == [
        host.add(p, q) for p, q in zip(Ps, Qs)
    ]
    wantd = [host.add(p, p) for p in Ps]
    assert curve.to_affine_int(jax.jit(curve.add)(P, P)) == wantd
    assert curve.to_affine_int(jax.jit(curve.double)(P)) == wantd


def test_complete_edge_cases(pts):
    _, Ps, _, P, _ = pts
    res = jax.jit(curve.add)(P, curve.neg(P))
    assert all(a is None for a in curve.to_affine_int(res))
    I = jnp.broadcast_to(
        curve.infinity().reshape(3, 8, 1), P.shape
    )
    assert curve.to_affine_int(jax.jit(curve.add)(P, I)) == Ps
    assert curve.to_affine_int(jax.jit(curve.add)(I, P)) == Ps
    assert all(a is None for a in curve.to_affine_int(jax.jit(curve.add)(I, I)))


def test_scalar_mul_and_order(pts):
    ks, Ps, _, P, _ = pts
    bits = jnp.asarray(curve.scalars_to_bits(ks))
    got = curve.to_affine_int(jax.jit(curve.scalar_mul_gen)(bits))
    assert got == [host.smul(k, (host.GX, host.GY)) for k in ks]
    got = curve.to_affine_int(jax.jit(curve.scalar_mul)(bits, P))
    assert got == [host.smul(k, p) for k, p in zip(ks, Ps)]
    rbits = jnp.broadcast_to(jnp.asarray(curve.scalars_to_bits([host.R])), (232, N))
    assert all(a is None for a in curve.to_affine_int(jax.jit(curve.scalar_mul)(rbits, P)))


def test_scalar_mul_linearity(pts):
    # [k1]G + [k2]G == [k1+k2]G (reference: test_validate_psm_with_point_add)
    ks, _, _, _, _ = pts
    k1, k2 = ks[0], ks[1]
    bits = jnp.asarray(curve.scalars_to_bits([k1, k2, (k1 + k2) % host.R]))
    res = jax.jit(curve.scalar_mul_gen)(bits)
    s = curve.add(res[..., 0], res[..., 1])
    assert bool(np.array(curve.eq(s, res[..., 2])))


def test_msm(pts):
    ks, Ps, _, P, _ = pts
    bits = jnp.asarray(curve.scalars_to_bits(ks))
    got = curve.to_affine_int(jax.jit(curve.msm)(bits, P))
    acc = None
    for k, p in zip(ks, Ps):
        acc = host.add(acc, host.smul(k, p))
    assert got == acc


def test_encode_decode(pts):
    _, Ps, _, _, _ = pts
    for p in Ps + [None]:
        dec, valid = host.decode(host.encode(p))
        assert valid and dec == p
    bad = bytearray(host.encode(Ps[0]))
    bad[29] |= 0x80
    assert host.decode(bytes(bad))[1] is False
    # reject points outside the prime-order subgroup (P + 2-torsion)
    gt = host.add(Ps[0], (0, 1))
    assert host.decode(host.encode(gt))[1] is False
