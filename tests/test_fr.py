"""Fr limb arithmetic vs an exact Python-int oracle.

Mirrors the reference's field-test strategy (small-N property tests vs
brute force, SURVEY.md section 4): every op is compared against plain
integer arithmetic mod p.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvpari_tpu.ops import fr

N = 32


@pytest.fixture(scope="module")
def rand_pairs():
    rng = random.Random(1234)
    xs = [rng.randrange(fr.P) for _ in range(N)]
    ys = [rng.randrange(fr.P) for _ in range(N)]
    return xs, ys, jnp.asarray(fr.from_int(xs)), jnp.asarray(fr.from_int(ys))


def test_add_sub_mul_neg(rand_pairs):
    xs, ys, X, Y = rand_pairs

    @jax.jit
    def all_ops(X, Y):
        return fr.add(X, Y), fr.sub(X, Y), fr.mul(X, Y), fr.neg(X)

    a, s, m, n = all_ops(X, Y)
    assert fr.to_int(a) == [(x + y) % fr.P for x, y in zip(xs, ys)]
    assert fr.to_int(s) == [(x - y) % fr.P for x, y in zip(xs, ys)]
    assert fr.to_int(m) == [(x * y) % fr.P for x, y in zip(xs, ys)]
    assert fr.to_int(n) == [(-x) % fr.P for x in xs]


def test_loose_chaining(rand_pairs):
    xs, _, X, _ = rand_pairs

    @jax.jit
    def chain(x):
        for _ in range(6):
            x = fr.mul(fr.add(x, x), x)
        return x

    got = fr.to_int(chain(X))
    want = []
    for a in xs:
        v = a
        for _ in range(6):
            v = (2 * v * v) % fr.P
        want.append(v)
    assert got == want


def test_inversion(rand_pairs):
    xs, _, X, _ = rand_pairs
    assert fr.to_int(jax.jit(fr.inv)(X)) == [pow(a, fr.P - 2, fr.P) for a in xs]
    assert fr.to_int(jax.jit(fr.batch_inverse)(X)) == [
        pow(a, fr.P - 2, fr.P) for a in xs
    ]


def test_edge_values():
    E = jnp.asarray(fr.from_int([0, 1, fr.P - 1, fr.P - 2]))

    @jax.jit
    def ops(E):
        return (fr.add(E, E), fr.is_zero(E), fr.mul(E, E),
                fr.is_zero(fr.sub(E, E)), fr.batch_inverse(E))

    a, z, m, z2, bi = ops(E)
    assert fr.to_int(a) == [0, 2, fr.P - 2, fr.P - 4]
    assert list(np.array(z)) == [True, False, False, False]
    assert fr.to_int(m) == [0, 1, 1, 4]
    assert all(np.array(z2))
    # inv(0) == 0 contract (reference never inverts zero).
    assert fr.to_int(bi)[0] == 0


def test_strong_normalize_canonical(rand_pairs):
    _, _, X, _ = rand_pairs
    loose = jax.jit(lambda X: fr.mul(fr.mul(X, X), fr.neg(X)))(X)
    sn = np.array(jax.jit(fr.strong_normalize)(loose))
    assert sn.min() >= 0 and sn.max() <= fr.MASK
    assert fr.to_int(sn) == fr.to_int(loose)


def test_horner_powers_sum(rand_pairs):
    xs, _, X, _ = rand_pairs
    rng = random.Random(7)
    cs = [rng.randrange(fr.P) for _ in range(17)]
    C = jnp.asarray(fr.from_int(cs))
    x0 = jnp.asarray(fr.from_int(xs[0]))
    want = 0
    for c in reversed(cs):
        want = (want * xs[0] + c) % fr.P

    @jax.jit
    def ops(C, x0, X):
        return (fr.horner_eval(C, x0), fr.powers(x0, 9),
                fr.sum_along(X, axis=0))

    h, pw, s = ops(C, x0, X)
    assert fr.to_int(h) == want
    assert fr.to_int(pw) == [pow(xs[0], i, fr.P) for i in range(9)]
    assert fr.to_int(s) == sum(xs) % fr.P
