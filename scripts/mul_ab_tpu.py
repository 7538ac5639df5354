"""On-chip A/B of the two bit-sliced GF(2^233) multiply formulations.

`gf2bs.mul` has two algebraically identical forms (ops/gf2bs.py:143-151):
  * "concat": per-window accumulator updates via concatenated slices
    (hardware-proven; what the Pallas ladder traces);
  * "skew":   broadcast partial products + anti-diagonal pad/reshape
    reduction (no read-modify-write; default off-TPU).
The XLA-traced paths outside the Pallas ladder (batch to-affine,
Frobenius chains, validity checks) pick one at trace time; this script
settles which one the TPU backend actually prefers (VERDICT r2 item 9's
do-or-drop A/B).

Method: jit a fixed 8x squaring-free multiply chain over a (233, C)
bit-plane operand pair (chain keeps the kernel compute-bound instead of
HBM-bound at small C), one program per impl, median of 5 timed fetches.

Run from /root/repo (no PYTHONPATH): python scripts/mul_ab_tpu.py [log2_C]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

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

import jax.numpy as jnp
import numpy as np

from dvpari_tpu.ops import gf2bs

CHAIN = 8


def make_fn(impl):
    def chain(a, b):
        for _ in range(CHAIN):
            a = gf2bs.mul(a, b)
        return a

    def wrapped(a, b):
        old = gf2bs.MUL_IMPL
        gf2bs.MUL_IMPL = impl
        try:
            return chain(a, b)
        finally:
            gf2bs.MUL_IMPL = old

    return jax.jit(wrapped)


def main():
    log_c = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    C = 1 << log_c
    print("devices:", jax.devices(), "C = 2^%d, chain = %d" % (log_c, CHAIN),
          flush=True)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 1 << 32, (gf2bs.M, C), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, (gf2bs.M, C), dtype=np.uint32))

    results = {}
    for impl in ("concat", "skew"):
        fn = make_fn(impl)
        t0 = time.perf_counter()
        out = np.asarray(jax.device_get(fn(a, b)))
        print(f"{impl}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        results[impl] = out
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(a, b)))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        muls = CHAIN * C / med
        print(
            f"{impl}: median {med*1e3:.1f} ms over 5 "
            f"({muls/1e6:.1f}M GF(2^233) muls/s; "
            f"spread {100*(max(times)-min(times))/med:.0f}%)",
            flush=True,
        )
    assert np.array_equal(results["concat"], results["skew"]), "impl mismatch"
    print("outputs identical; A/B COMPLETE", flush=True)


if __name__ == "__main__":
    main()
