"""Mid-size e2e on the real TPU: m=1024 constraints, full pipeline."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time, random
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "DVPARI_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", "tpu")))
os.environ["DVPARI_TRACE"] = "1"
import numpy as np
from dvpari_tpu.r1cs import gnark
from dvpari_tpu.ops import fr
from dvpari_tpu.protocol import srs as S, prover as PR
from dvpari_tpu.storage import artifacts as art

from dvpari_tpu.r1cs.toy import synth_squaring_chain


def synth_circuit(n_rows):
    """Squaring-chain circuit (shared helper; n_rows includes the two
    public-output rows, matching the old local definition)."""
    return synth_squaring_chain(n_rows - 2)

# repo-local (gitignored) so the artifact cache survives driver /tmp wipes
cache = os.environ.get(
    "DVPARI_MID_E2E_CACHE",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_cache", "mid_e2e",
    ),
)
os.makedirs(cache, exist_ok=True)
dump, pub, chain = synth_circuit(1022)  # pads to m=1024
with open(os.path.join(cache, art.R1CS_CONSTRAINTS_FILE), "wb") as f:
    f.write(dump)
td = S.Trapdoor.from_seed(b"mid-scale-test")
t0 = time.time(); S.verifier_runs_setup(td, cache, 2, True, True)
print(f"SETUP m=1024: {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); PR.prover_prepares_precomputes(cache, True)
print(f"PRECOMPUTE: {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); proof = PR.prove(cache, pub, chain)
print(f"PROVE m=1024: {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); ok = S.verify(td, pub, proof)
print(f"VERIFY: {time.time()-t0:.1f}s -> {ok}", flush=True)
assert ok
print("MID-SIZE E2E OK", flush=True)
