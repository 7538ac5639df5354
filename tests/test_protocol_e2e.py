"""End-to-end toy setup/prove/verify - the canonical whole-system check.

Mirror of the reference's e2e harness
(reference: test_dvsnark_prover_over_toy_r1cs, src/dvsnark_test.rs:131-180).
"""

import os
import tempfile

import pytest

from dvpari_tpu.r1cs.toy import toy_r1cs_dump, toy_witness
from dvpari_tpu.protocol import srs as srs_mod
from dvpari_tpu.protocol import prover as prover_mod
from dvpari_tpu.protocol.proof import Proof
from dvpari_tpu.protocol.transcript import Transcript
from dvpari_tpu.storage import artifacts as art

# ~5-6 min of XLA:CPU compiles for the full toy pipeline: slow tier.
# The default tier still proves/verifies end-to-end at m=8 via
# test_sharded_prove / test_sharded_scale's toy-size variant.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def e2e():
    cache = tempfile.mkdtemp(prefix="dvpari_pytest_e2e_")
    with open(os.path.join(cache, art.R1CS_CONSTRAINTS_FILE), "wb") as f:
        f.write(toy_r1cs_dump())
    pub, wit = toy_witness()
    td = srs_mod.Trapdoor.from_seed(b"dvpari-toy-43")
    srs_mod.verifier_runs_setup(td, cache, len(pub), True, True)
    prover_mod.prover_prepares_precomputes(cache, True)
    proof = prover_mod.prove(cache, pub, wit)
    return cache, pub, wit, td, proof


def test_proof_verifies(e2e):
    _, pub, _, td, proof = e2e
    assert srs_mod.verify(td, pub, proof)


def test_proof_serialization(e2e):
    _, pub, _, td, proof = e2e
    bits = proof.to_bits()
    assert len(bits) == 944  # 2x30B points + 2x232-bit scalars
    assert Proof.from_bits(bits) == proof
    assert srs_mod.verify(td, pub, Proof.from_bits(bits))


def test_proof_bits_pinned(e2e):
    """The complete 944-bit toy proof against the committed golden vector
    (tests/golden_n16.py TOY_PROOF_HEX): end-to-end protocol drift --
    wherever it hides -- fails this fixture (VERDICT r2 item 8)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import golden_n16 as G
    from dvpari_tpu.protocol.proof import _bits_to_bytes_le

    _, _, _, _, proof = e2e
    assert _bits_to_bytes_le(proof.to_bits()).hex() == G.TOY_PROOF_HEX


def test_rejections(e2e):
    _, pub, _, td, proof = e2e
    assert not srs_mod.verify(td, [pub[0] + 1, pub[1]], proof)
    bits = proof.to_bits()
    bad = Proof.from_bits([not b if i == 500 else b for i, b in enumerate(bits)])
    assert not srs_mod.verify(td, pub, bad)
    td2 = srs_mod.Trapdoor.from_seed(b"not-the-verifier")
    assert not srs_mod.verify(td2, pub, proof)


def test_bad_witness_rejected_by_prover(e2e):
    cache, pub, wit, _, _ = e2e
    with pytest.raises(AssertionError):
        prover_mod.prove(cache, pub, [w + 1 for w in wit])


def test_transcript_determinism():
    t1, t2 = Transcript(), Transcript()
    for t in (t1, t2):
        t.srs_hash()
        t.circuit_info_hash()
        t.public_input_hash([5, 7])
        t.witness_commitment_hash([b"\x01" * 30])
    assert t1.output() == t2.output()
    assert t1.output() < (1 << 224)  # 224-bit masked challenge
    t2.public_input_hash([5, 8])
    assert t1.output() != t2.output()
