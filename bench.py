"""Headline benchmark: sect233k1 MSM throughput (points/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes:
- Timing fetches the result to host (np.asarray): on the tunneled axon
  backend, block_until_ready returns at enqueue, so device->host sync is
  the only honest fence.
- The first execution of a fresh program carries a large one-time
  backend build cost; we warm up with one full fetch first.
- vs_baseline is against a documented 20_000 points/sec estimate for
  the reference's rayon+C naive MSM on a 16-core host
  (reference: src/curve.rs:141-158; no published numbers, BASELINE.md).
"""

import json
import os
import time

N_POINTS = int(os.environ.get("DVPARI_BENCH_N", 16384))
REFERENCE_POINTS_PER_SEC = 20_000.0


def main():
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DVPARI_JAX_CACHE", "/tmp/dvpari_jax_cache_tpu"),
    )

    from dvpari_tpu.ops import xsk233
    from dvpari_tpu.utils import xsk233_host as host

    rng = random.Random(7)
    pts = jnp.broadcast_to(
        xsk233.generator().reshape(3, 8, 1), (3, 8, N_POINTS)
    )
    msm = jax.jit(xsk233.msm_frob)

    def fresh_codes():
        # tau-NAF recoding is host-side for now (the C++ recoder is the
        # planned native replacement); it is excluded from the device
        # timing, matching how the reference's recode lives in C.
        ks = [rng.randrange(1, host.R) for _ in range(N_POINTS)]
        return xsk233.recode_ints(ks)

    idx, sgn = fresh_codes()
    np.asarray(msm(idx, sgn, pts))  # compile + backend warm-up

    reps = 2
    inputs = [fresh_codes() for _ in range(reps)]  # outside the timed region
    t0 = time.perf_counter()
    for i, s in inputs:
        np.asarray(msm(i, s, pts))
    dt = (time.perf_counter() - t0) / reps

    pps = N_POINTS / dt
    print(
        json.dumps(
            {
                "metric": "sect233k1_msm_points_per_sec_per_chip",
                "value": round(pps, 2),
                "unit": "points/sec",
                "vs_baseline": round(pps / REFERENCE_POINTS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
