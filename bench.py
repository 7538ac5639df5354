"""Headline benchmark: sect233k1 MSM throughput (points/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the PRODUCTION path end-to-end: dvpari_tpu.ops.xsk233.msm_limbs
on device Fr limb scalars -- native tau-NAF recode-to-masks, bit-plane
packing, and the fused bit-sliced Pallas ladder on-chip.  Recoding is
INCLUDED in the timed region (the number a prover actually gets).  The
point set is DISTINCT points [e_i]G from the production fixed-base
fan-out, and every rep's full MSM result is asserted against a host
oracle ((sum k_i e_i mod R) * G), so a wrong answer fails the bench.

Measurement notes:
- Timing fetches the result to host (np.asarray): on the tunneled axon
  backend, block_until_ready returns at enqueue, so device->host sync is
  the only honest fence.
- The first execution carries compile + one-time backend build cost; we
  warm up with one full fetch first (also warms the persistent compile
  cache for subsequent runs).
- vs_baseline is against a documented 20_000 points/sec estimate for
  the reference's rayon+C naive MSM on a 16-core host
  (reference: src/curve.rs:141-158; no published numbers, BASELINE.md).
"""

import json
import os
import time

N_POINTS = int(os.environ.get("DVPARI_BENCH_N", 1 << 18))
REFERENCE_POINTS_PER_SEC = 20_000.0


def _tpu_relay_alive() -> bool:
    """True if any local TPU-tunnel relay port accepts connections.
    jax.devices() blocks forever when the axon relay is dead; failing
    fast keeps the bench harness from hanging."""
    import socket

    for port in (8082, 8083, 8087, 8092, 8093, 8097, 8102, 8103, 8107,
                 8112, 8113, 8117):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def main():
    import random
    import sys

    if os.environ.get("JAX_PLATFORMS", "") in ("", "axon") and not _tpu_relay_alive():
        print("bench: TPU relay unreachable (no tunnel port listening); "
              "set JAX_PLATFORMS=cpu for a CPU run", file=sys.stderr)
        raise SystemExit(3)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin force-overrides jax_platforms at import
        # time; pin the config so JAX_PLATFORMS=cpu really means CPU
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # Repo-local persistent compile cache: /tmp is wiped between driver
    # sessions, and cold TPU compiles over the tunnel cost minutes each;
    # the repo directory survives, so warm compiles carry across rounds.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "DVPARI_JAX_CACHE",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".jax_cache", "tpu"
            ),
        ),
    )

    from dvpari_tpu.ops import fr, xsk233
    from dvpari_tpu.utils import gf2_host as gh
    from dvpari_tpu.utils import xsk233_host as host
    from dvpari_tpu.utils import roofline

    rng = random.Random(7)
    # DISTINCT points with known discrete logs: P_i = [e_i]G from the
    # production fixed-base fan-out (the same path that writes the SRS).
    # Knowing e_i makes every rep's full MSM checkable against ONE host
    # smul: sum k_i * P_i == (sum k_i * e_i mod R) * G -- a bench that
    # would notice a wrong answer, at distinct-point realism.
    es = [rng.randrange(1, host.R) for _ in range(N_POINTS)]
    proj_host, planes_host = xsk233.mulgen_limbs_host(jnp.asarray(fr.from_int(es)))
    # bit-plane packing + device upload of the (fixed) point set: in the
    # prover this is the cached .planes.npz SRS sidecar, uploaded once
    # and kept device-resident across proves (artifacts.py:
    # read_point_vec_planes_device), so both sit outside the per-prove
    # cost; scalars + recoding are per-prove and stay timed.
    planes = jnp.asarray(planes_host)
    pts = lambda: jnp.asarray(proj_host)  # lazy: only the non-bs path loads it

    def fresh_scalars():
        ks = [rng.randrange(1, host.R) for _ in range(N_POINTS)]
        return ks, jnp.asarray(fr.from_int(ks))

    def to_affine_int(res):
        w = np.asarray(res)
        X, Y, Z = (
            sum(int(w[c, i]) << (32 * i) for i in range(8)) for c in range(3)
        )
        zi = gh.inv_int(Z)
        return gh.mul_int(X, zi), gh.mul_int(Y, zi)

    # compile + backend warm-up (one full end-to-end pass)
    np.asarray(
        jax.device_get(xsk233.msm_limbs(fresh_scalars()[1], pts, planes=planes))
    )

    # reps >= 5 with median + spread: the median is the honest
    # steady-state figure and the spread makes run-to-run drift visible
    # instead of narrating whichever single rep happened to land.
    reps = int(os.environ.get("DVPARI_BENCH_REPS", 5))
    inputs = [fresh_scalars() for _ in range(reps)]
    for _, s in inputs:
        np.asarray(s)  # materialize scalar uploads outside the timed region
    times, results = [], []
    for _, s in inputs:
        t0 = time.perf_counter()
        res = np.asarray(jax.device_get(xsk233.msm_limbs(s, pts, planes=planes)))
        times.append(time.perf_counter() - t0)
        results.append(res)
    dt = float(np.median(times))

    # correctness: every rep's MSM vs the host oracle (outside the timed
    # region; constant-time kernels make the timings input-independent)
    for (ks, _), res in zip(inputs, results):
        want_k = sum(k * e for k, e in zip(ks, es)) % host.R
        assert to_affine_int(res) == host.smul(want_k, (host.GX, host.GY)), (
            "MSM result mismatch vs host oracle"
        )

    pps = N_POINTS / dt
    cost = roofline.msm_bitsliced_cost(N_POINTS)
    rep = roofline.achieved(cost, dt)
    print(
        json.dumps(
            {
                "metric": "sect233k1_msm_e2e_points_per_sec_per_chip",
                "value": round(pps, 2),
                "unit": "points/sec",
                "vs_baseline": round(pps / REFERENCE_POINTS_PER_SEC, 4),
                "reps": reps,
                "rep_points_per_sec": [round(N_POINTS / t, 1) for t in times],
                "spread_pct": round(
                    100.0 * (max(times) - min(times)) / dt, 1
                ),
                "roofline": {
                    "lane_gops": round(cost.lane_ops / 1e9, 2),
                    "achieved_gops_s": round(rep.lane_ops_per_s / 1e9, 1),
                    "pct_vpu_peak": round(rep.pct_vpu_peak, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
