"""Sharded production prover == unsharded proof bits, on the 8-device
CPU mesh (the driver separately dry-runs the same path via
__graft_entry__.dryrun_multichip).

This exercises protocol/prover.py itself on the mesh -- the three MSMs
with sharded points/codes and the domain-sharded extend/quotient/
k-scalar stages -- not a standalone demo kernel.  (reference analog:
the rayon map+reduce inside multi_scalar_mul, src/curve.rs:141-158.)
"""

import os
import tempfile

import jax
import pytest

from dvpari_tpu.r1cs.toy import toy_r1cs_dump, toy_witness
from dvpari_tpu.protocol import srs as srs_mod
from dvpari_tpu.protocol import prover as prover_mod
from dvpari_tpu.storage import artifacts as art
from dvpari_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_prove_matches_unsharded(no_persistent_compile_cache):
    cache = tempfile.mkdtemp(prefix="dvpari_pytest_shard_")
    with open(os.path.join(cache, art.R1CS_CONSTRAINTS_FILE), "wb") as f:
        f.write(toy_r1cs_dump())
    pub, wit = toy_witness()
    td = srs_mod.Trapdoor.from_seed(b"dvpari-toy-shard")
    srs_mod.verifier_runs_setup(td, cache, len(pub), True, True)
    prover_mod.prover_prepares_precomputes(cache, True)

    base = prover_mod.prove(cache, pub, wit)
    mesh = make_mesh(8)
    sharded = prover_mod.prove(cache, pub, wit, mesh=mesh)

    assert sharded.to_bits() == base.to_bits()
    assert srs_mod.verify(td, pub, sharded)
