"""Mid-size e2e on the real TPU: m=1024 constraints, full pipeline."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time, random
import jax
jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", "tpu"))
os.environ["DVPARI_TRACE"] = "1"
import numpy as np
from dvpari_tpu.r1cs import gnark
from dvpari_tpu.ops import fr
from dvpari_tpu.protocol import srs as S, prover as PR
from dvpari_tpu.storage import artifacts as art

def synth_circuit(n_rows):
    """Squaring-chain circuit: wire i+1 = wire_i^2; two public outputs."""
    coeffs = [1]
    c1 = lambda w: (w, 0)
    rows = []
    # wires: 0=one, 1=pub o, 2=pub w, 3..=chain
    first_chain = 3
    n_chain = n_rows - 2
    for i in range(n_chain):
        a = first_chain + i
        rows.append(([c1(a)], [c1(a)], [c1(a + 1)]))
    last = first_chain + n_chain
    mid = first_chain + n_chain // 2
    rows.append(([c1(last)], [c1(0)], [c1(1)]))   # o = chain end
    rows.append(([c1(mid)], [c1(0)], [c1(2)]))    # w = chain middle
    # witness
    x = 3
    chain = [x]
    for _ in range(n_chain):
        chain.append(chain[-1] * chain[-1] % fr.P)
    pub = [chain[-1], chain[n_chain // 2]]
    return gnark.write_sparse_r1cs(coeffs, rows), pub, chain

cache = "/tmp/dvpari_mid_e2e"
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
