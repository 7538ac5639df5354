"""GF(2^233) device kernels vs the python-int host oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpari_tpu.ops import gf2
from dvpari_tpu.utils import gf2_host as gh

N = 24


@pytest.fixture(scope="module")
def batch():
    rng = random.Random(9)
    xs = [gh.reduce_int(rng.getrandbits(233)) for _ in range(N)]
    ys = [gh.reduce_int(rng.getrandbits(233)) for _ in range(N)]
    # include edge values
    xs[0], xs[1] = 0, 1
    ys[0], ys[1] = 1, (1 << 232) | (1 << 74) | 1
    return xs, ys, jnp.asarray(gf2.from_int(xs)), jnp.asarray(gf2.from_int(ys))


@pytest.fixture(scope="module")
def results(batch):
    xs, ys, X, Y = batch

    @jax.jit
    def ops(X, Y):
        return (
            gf2.mul(X, Y),
            gf2.square(X),
            gf2.inv(X),
            gf2.sqrt(X),
            gf2.trace(X),
            gf2.halftrace(X),
        )

    return ops(X, Y)


def test_mul(batch, results):
    xs, ys, _, _ = batch
    assert gf2.to_int(results[0]) == [gh.mul_int(a, b) for a, b in zip(xs, ys)]


def test_square(batch, results):
    xs, _, _, _ = batch
    assert gf2.to_int(results[1]) == [gh.square_int(a) for a in xs]


def test_inv(batch, results):
    xs, _, _, _ = batch
    # inv(0) == 0 by the Fermat chain; matches host contract
    assert gf2.to_int(results[2]) == [gh.inv_int(a) for a in xs]


def test_sqrt(batch, results):
    xs, _, _, _ = batch
    assert gf2.to_int(results[3]) == [gh.sqrt_int(a) for a in xs]


def test_trace(batch, results):
    xs, _, _, _ = batch
    assert list(np.array(results[4])) == [gh.trace_int(a) for a in xs]


def test_halftrace(batch, results):
    xs, _, _, _ = batch
    got = gf2.to_int(results[5])
    assert got == [gh.halftrace_int(a) for a in xs]
    # halftrace solves z^2 + z = a whenever Tr(a) = 0
    for a, z in zip(xs, got):
        if gh.trace_int(a) == 0:
            assert gh.square_int(z) ^ z == a


def test_trace_mask_sparse():
    # the dual-basis trace mask for x^233 + x^74 + 1 has exactly 2 bits
    assert bin(gh.TRACE_MASK).count("1") == 2
