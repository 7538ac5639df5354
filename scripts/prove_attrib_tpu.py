"""Honest per-stage attribution of a warm prove on the real TPU.

Runs prove twice against an existing scale cache with
DVPARI_SYNC_PHASES=1 (every phase fenced by a device fetch) plus
fine-grained timers around the stages outside phases (witness prep,
sat-check).  Usage: python scripts/prove_attrib_tpu.py [log_m] [impl]
where impl is chunked|fused (DVPARI_PASS_IMPL).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", "tpu",
    ),
)
os.environ.setdefault("DVPARI_TRACE", "1")
os.environ["DVPARI_SYNC_PHASES"] = "1"

import numpy as np


def main():
    log_m = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    if len(sys.argv) > 2:
        os.environ["DVPARI_PASS_IMPL"] = sys.argv[2]
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_cache", f"m{log_m}",
    )
    from dvpari_tpu.r1cs.toy import synth_squaring_chain
    from dvpari_tpu.protocol import prover as PR
    from dvpari_tpu.protocol import srs as S

    m = 1 << log_m
    t0 = time.time()
    dump, pub, chain = synth_squaring_chain(m - 4)
    print(f"synth: {time.time()-t0:.1f}s", flush=True)

    for rep in range(2):
        t0 = time.time()
        proof = PR.prove(cache, pub, chain)
        print(f"PROVE rep{rep}: {time.time()-t0:.1f}s", flush=True)
    td = S.Trapdoor.from_seed(b"scale-test-%d" % log_m)
    t0 = time.time()
    ok = S.verify(td, pub, proof)
    print(f"verify: {time.time()-t0:.3f}s -> {ok}", flush=True)


if __name__ == "__main__":
    main()
