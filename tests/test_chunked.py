"""Chunked pass engine vs the fused per-shape ECFFT programs.

The chunked engine (fftree/chunked.py) re-executes enter/extend as
fixed-width pass pipelines; results must be bit-identical to the fused
per-level programs on the same tree.  A tiny DVPARI_PASS_CHUNK exercises
both program families (SMALL in-chunk spans and BIG two-chunk spans) on
toy domains.
"""

import numpy as np
import pytest

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree.tree import FFTree


def _rand_vec(rng, n):
    return np.asarray(fr.from_int([rng.randrange(fr.P) for _ in range(n)]))


@pytest.fixture(scope="module")
def tree():
    return FFTree.build(256, False, 8)


def _ints(v):
    return fr.to_int(v)


def test_enter_chunked_matches_fused(tree, monkeypatch):
    import random

    rng = random.Random(101)
    c = _rand_vec(rng, 256)
    monkeypatch.setenv("DVPARI_PASS_IMPL", "fused")
    want = _ints(tree.enter(np.asarray(c), 0))
    monkeypatch.setenv("DVPARI_PASS_IMPL", "chunked")
    # C=32 on n=256: levels span 1..128 -> BIG dec/rec (span >= 64),
    # BIG combine (s >= 32), and the SMALL family below
    monkeypatch.setenv("DVPARI_PASS_CHUNK", "32")
    got = _ints(tree.enter(np.asarray(c), 0))
    assert got == want


def test_enter_chunked_view_d1(tree, monkeypatch):
    import random

    rng = random.Random(102)
    c = _rand_vec(rng, 128)
    monkeypatch.setenv("DVPARI_PASS_IMPL", "fused")
    want = _ints(tree.enter(np.asarray(c), 1))
    monkeypatch.setenv("DVPARI_PASS_IMPL", "chunked")
    monkeypatch.setenv("DVPARI_PASS_CHUNK", "16")
    got = _ints(tree.enter(np.asarray(c), 1))
    assert got == want


@pytest.mark.parametrize("moiety", ["S1", "S0"])
def test_extend_chunked_matches_fused(tree, moiety, monkeypatch):
    import random

    rng = random.Random(103)
    e = _rand_vec(rng, 128)
    monkeypatch.setenv("DVPARI_PASS_IMPL", "fused")
    want = _ints(tree.extend(np.asarray(e), moiety, 0))
    monkeypatch.setenv("DVPARI_PASS_IMPL", "chunked")
    monkeypatch.setenv("DVPARI_PASS_CHUNK", "16")
    got = _ints(tree.extend(np.asarray(e), moiety, 0))
    assert got == want


def test_chunk_boundary_cases(tree, monkeypatch):
    """n == 2C (smallest chunked case) and C > n (fused fallback)."""
    import random

    rng = random.Random(104)
    c = _rand_vec(rng, 256)
    monkeypatch.setenv("DVPARI_PASS_IMPL", "fused")
    want = _ints(tree.enter(np.asarray(c), 0))
    monkeypatch.setenv("DVPARI_PASS_IMPL", "chunked")
    monkeypatch.setenv("DVPARI_PASS_CHUNK", "128")  # n = 2C
    assert _ints(tree.enter(np.asarray(c), 0)) == want
    monkeypatch.setenv("DVPARI_PASS_CHUNK", "512")  # C > n: fused path
    assert _ints(tree.enter(np.asarray(c), 0)) == want


def test_warm_universe_compiles(monkeypatch):
    from dvpari_tpu.fftree import chunked

    monkeypatch.setenv("DVPARI_PASS_CHUNK", "16")
    chunked.warm(workers=2)
