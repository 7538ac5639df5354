"""Scale e2e on the real TPU: synthetic m=2^k squaring-chain circuit,
full pipeline with per-phase traces and a warm (second) prove.

VERDICT item 3 'Done' criterion: synthetic 2^20 e2e on the TPU with
recorded per-phase times and no python-loop device stage.

Run from /root/repo (no PYTHONPATH):  python scripts/scale_e2e_tpu.py [log2_m]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, sys, time

import jax

if os.environ.get("DVPARI_PLATFORM"):
    # the axon TPU plugin overrides JAX_PLATFORMS; a config update is the
    # only way to force CPU when the tunnel is down
    jax.config.update("jax_platforms", os.environ["DVPARI_PLATFORM"])
    if os.environ["DVPARI_PLATFORM"] == "cpu":
        # XLA:CPU AOT cache entries self-poison on reload (JOURNAL.md)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

# repo-local cache: survives the /tmp wipe between driver sessions
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "DVPARI_JAX_CACHE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache", "tpu",
        ),
    ),
)
os.environ.setdefault("DVPARI_TRACE", "1")

import numpy as np

from dvpari_tpu.r1cs import gnark
from dvpari_tpu.ops import fr
from dvpari_tpu.protocol import srs as S, prover as PR
from dvpari_tpu.storage import artifacts as art


from dvpari_tpu.r1cs.toy import synth_squaring_chain, synth_multiterm


def synth_circuit(n_rows):
    """Scale circuit (n_rows includes the two public-output rows).

    DVPARI_SCALE_CIRCUIT=multiterm selects the SP1-realistic generator
    (4 terms per matrix row, shared 512-entry coefficient table --
    nnz/matrix = 4m, exercising the chunked segment-sum and Vandermonde
    splice the way the reference's production R1CS does); default is the
    one-term squaring chain."""
    if os.environ.get("DVPARI_SCALE_CIRCUIT") == "multiterm":
        return synth_multiterm(n_rows - 2)
    return synth_squaring_chain(n_rows - 2)


def main(log_m: "int | None" = None):
    if log_m is None:
        log_m = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    m = 1 << log_m
    variant = "mt" if os.environ.get("DVPARI_SCALE_CIRCUIT") == "multiterm" else ""
    print(
        "devices:", jax.devices(), "m = 2^%d%s" % (log_m, variant), flush=True
    )
    # repo-local (gitignored) default: the artifact cache survives the
    # /tmp wipe between driver sessions, so reruns resume mid-pipeline
    cache = os.environ.get(
        "DVPARI_SCALE_CACHE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_cache", f"m{log_m}{variant}",
        ),
    )
    os.makedirs(cache, exist_ok=True)
    if variant:
        # domain precomputes (trees, vanishing polys, weights, z-invs)
        # depend only on m -- share them with the plain-circuit cache via
        # hardlinks instead of re-deriving ~10 min of tables
        plain = os.path.join(os.path.dirname(cache), f"m{log_m}")
        if os.path.isdir(plain):
            import shutil

            for name in os.listdir(plain):
                if not (
                    name.startswith(("tree2n", "tree2nd", "z_", "bar_"))
                ):
                    continue
                src, dst = os.path.join(plain, name), os.path.join(cache, name)
                if os.path.exists(dst):
                    continue
                if os.path.isdir(src):
                    shutil.copytree(src, dst, copy_function=os.link)
                else:
                    os.link(src, dst)

    t0 = time.time()
    dump, pub, chain = synth_circuit(m - 2)  # pads to m
    path = os.path.join(cache, art.R1CS_CONSTRAINTS_FILE)
    if not os.path.exists(path):
        with open(path, "wb") as f:
            f.write(dump)
    print(f"synth circuit: {time.time()-t0:.1f}s", flush=True)

    td = S.Trapdoor.from_seed(b"scale-test-%d" % log_m)
    t0 = time.time()
    S.verifier_runs_setup(td, cache, 2, True, True)
    print(f"SETUP m=2^{log_m}: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    PR.prover_prepares_precomputes(cache, True)
    print(f"PRECOMPUTE: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    proof = PR.prove(cache, pub, chain)
    print(f"PROVE (cold) m=2^{log_m}: {time.time()-t0:.1f}s", flush=True)
    from dvpari_tpu.utils import roofline, timing

    ev_start = len(timing.EVENTS)
    t0 = time.time()
    proof = PR.prove(cache, pub, chain)
    warm_s = time.time() - t0
    print(f"PROVE (warm) m=2^{log_m}: {warm_s:.1f}s", flush=True)

    # per-phase roofline of the warm prove (BASELINE.json north star)
    print("--- warm prove roofline ---", flush=True)
    for e in timing.EVENTS[ev_start:]:
        name, secs, n = e["phase"], e["seconds"], e.get("n")
        if name.startswith("prove.msm") and n:
            cost = roofline.msm_bitsliced_cost(int(n))
        elif "extend" in name and n:
            cost = roofline.extend_cost(int(n))
        else:
            continue
        print(roofline.format_row(name, cost, roofline.achieved(cost, secs)), flush=True)
    t0 = time.time()
    ok = S.verify(td, pub, proof)
    print(f"VERIFY: {time.time()-t0:.1f}s -> {ok}", flush=True)
    assert ok
    print("SCALE E2E OK", flush=True)


if __name__ == "__main__":
    main()
