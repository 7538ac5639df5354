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


def test_synth_multiterm_satisfies_and_deterministic():
    """SP1-realistic generator: every row satisfied by the returned
    witness under the [1, pubs, privates] wire layout; byte-deterministic
    for a fixed seed; nnz = terms per matrix row."""
    from dvpari_tpu.r1cs.toy import synth_multiterm

    dump, pub, priv = synth_multiterm(30, terms=4, n_coeffs=64, seed=5)
    coeffs, rows = gnark.load_sparse_r1cs(dump)
    w = [1] + [p % fr.P for p in pub] + [v % fr.P for v in priv]
    assert len(rows) == 32
    chain_rows = rows[:-2]
    assert all(len(l) == len(r) == len(o) == 4 for l, r, o in chain_rows)
    for i, (l, r, o) in enumerate(rows):
        L = sum(coeffs[c] * w[wi] for wi, c in np.asarray(l).reshape(-1, 2))
        R = sum(coeffs[c] * w[wi] for wi, c in np.asarray(r).reshape(-1, 2))
        O = sum(coeffs[c] * w[wi] for wi, c in np.asarray(o).reshape(-1, 2))
        assert L % fr.P * (R % fr.P) % fr.P == O % fr.P, i
    d2, p2, v2 = synth_multiterm(30, terms=4, n_coeffs=64, seed=5)
    assert d2 == dump and p2 == pub and v2 == priv
    # a different seed changes the bytes (the generator really samples)
    d3, _, _ = synth_multiterm(30, terms=4, n_coeffs=64, seed=6)
    assert d3 != dump


def test_synth_multiterm_eval_matrix_matches_host():
    """The device gather/segment-sum eval path on a multi-term instance
    agrees with the host python-int evaluation."""
    from dvpari_tpu.r1cs.toy import synth_multiterm

    dump, pub, priv = synth_multiterm(14, terms=3, n_coeffs=32, seed=11)
    coeffs, rows = gnark.load_sparse_r1cs(dump)
    inst = gnark.instance_from_dump(dump, len(pub))
    w_ints = [1] + [p % fr.P for p in pub] + [v % fr.P for v in priv]
    w_dev = jnp.asarray(fr.from_int(w_ints))
    cdev = gnark.coeffs_device(inst)
    for mat, sel in ((inst.l, 0), (inst.r, 1), (inst.o, 2)):
        got = fr.to_int(gnark.eval_matrix(mat, cdev, w_dev))
        for i, row in enumerate(rows):
            want = sum(
                coeffs[c] * w_ints[wi]
                for wi, c in np.asarray(row[sel]).reshape(-1, 2)
            ) % fr.P
            assert got[i] == want, (sel, i)
