"""R1CS ingestion / SR1CS transform tests.

Mirrors the reference's gnark_r1cs tests: row satisfaction, Vandermonde
rewrite identity c' = c - i (reference: src/gnark_r1cs.rs:440-566).
"""

import random

import jax.numpy as jnp
import numpy as np

from dvpari_tpu.ops import fr
from dvpari_tpu.r1cs import gnark
from dvpari_tpu.r1cs.toy import toy_r1cs_dump, toy_witness


def test_dump_roundtrip():
    data = toy_r1cs_dump()
    coeffs, rows = gnark.load_sparse_r1cs(data)
    assert coeffs == [1, 2]
    assert len(rows) == 5
    assert gnark.write_sparse_r1cs(coeffs, rows) == data


def test_witness_roundtrip():
    vals = [0, 1, fr.P - 1, 123456789]
    assert gnark.load_witness(gnark.write_witness(vals)) == vals


def test_instance_padding_and_eval():
    inst = gnark.instance_from_dump(toy_r1cs_dump(), 2)
    assert inst.num_constraints == 8 and inst.num_rows == 5
    pub, priv = toy_witness()
    w = jnp.asarray(fr.from_int([1] + pub + priv))
    cd = gnark.coeffs_device(inst)
    a = fr.to_int(gnark.eval_matrix(inst.l, cd, w))
    b = fr.to_int(gnark.eval_matrix(inst.r, cd, w))
    c = fr.to_int(gnark.eval_matrix(inst.o, cd, w))
    for i in range(8):
        assert a[i] * b[i] % fr.P == c[i], f"row {i}"  # L*R = O before rewrite


def test_vandermonde_rewrite():
    # c' = c - i over the domain (reference:
    # test_update_to_include_vandermode_matrix_d, src/gnark_r1cs.rs:509-565)
    rng = random.Random(5)
    inst = gnark.instance_from_dump(toy_r1cs_dump(), 2)
    pub, priv = toy_witness()
    w = jnp.asarray(fr.from_int([1] + pub + priv))
    cd = gnark.coeffs_device(inst)
    c_before = fr.to_int(gnark.eval_matrix(inst.o, cd, w))
    dom = [rng.randrange(fr.P) for _ in range(8)]
    gnark.add_vandermonde_matrix(inst, dom)
    cd2 = gnark.coeffs_device(inst)
    c_after = fr.to_int(gnark.eval_matrix(inst.o, cd2, w))
    for i, d in enumerate(dom):
        i_val = gnark.evaluate_monomial_basis_poly(pub, d)
        assert (c_before[i] - i_val) % fr.P == c_after[i]


def test_vandermonde_zero_public_inputs():
    """k = 0 is a no-op rewrite (D has zero columns), not a crash."""
    rng = random.Random(6)
    inst = gnark.instance_from_dump(toy_r1cs_dump(), 0)
    w = jnp.asarray(fr.from_int([1] + list(sum(toy_witness(), []))))
    cd = gnark.coeffs_device(inst)
    before = fr.to_int(gnark.eval_matrix(inst.o, cd, w))
    gnark.add_vandermonde_matrix(inst, [rng.randrange(fr.P) for _ in range(8)])
    assert inst.has_vandermonde
    after = fr.to_int(gnark.eval_matrix(inst.o, gnark.coeffs_device(inst), w))
    assert before == after


def test_sparse_accumulate_long_segment_exact():
    # overflow regression: a single segment with >258k terms used to
    # overflow raw int32 limb accumulation silently (ADVICE r1: srs.py
    # medium); the chunked path must stay exact for any segment length
    rng = np.random.default_rng(11)
    n_terms = 300_000
    n_c, n_v = 8, 4
    pyrng = random.Random(11)
    coeff_ints = [pyrng.randrange(fr.P) for _ in range(n_c)]
    vec_ints = [pyrng.randrange(fr.P) for _ in range(n_v)]
    cids = rng.integers(0, n_c, n_terms).astype(np.int32)
    gids = rng.integers(0, n_v, n_terms).astype(np.int32)
    segs = np.zeros(n_terms, dtype=np.int64)
    segs[-50:] = 1  # a second, short segment
    out = gnark.sparse_accumulate(
        jnp.asarray(fr.from_int(coeff_ints)),
        jnp.asarray(fr.from_int(vec_ints)),
        cids, gids, segs, 2,
    )
    got = fr.to_int(out)
    for s in range(2):
        mask = segs == s
        counts = np.bincount(
            cids[mask] * n_v + gids[mask], minlength=n_c * n_v
        )
        expect = sum(
            int(counts[i * n_v + j]) * coeff_ints[i] * vec_ints[j]
            for i in range(n_c)
            for j in range(n_v)
        ) % fr.P
        assert got[s] == expect, f"segment {s}"


def test_sp1_public_input_scalar():
    # 224-bit truncation property (reference: src/gnark_r1cs.rs:214-229)
    v = gnark.sp1_generate_scalar_from_raw_public_input(0x59_00000037)
    assert 0 <= v < (1 << 224)
    assert v == gnark.sp1_generate_scalar_from_raw_public_input(0x59_00000037)
