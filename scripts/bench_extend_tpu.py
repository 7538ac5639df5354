"""Extend-kernel A/B on the real TPU: fused vs chunked vs flat-pass.

The warm 2^18 prove spends ~8 s in the four ECFFT extends (~50 Gops/s,
~1.3% VPU) while the MSM runs at 54% VPU.  Hypothesis: the per-level
state shapes (20, V, s) put a SMALL span in the minor dims at most
levels, so the (8, 128) TPU tiling wastes up to 128x of every vector op.
The flat-pass prototype keeps every butterfly at full (20, C) width:

    out = A o x + B o swap_half(x)
    swap_half(x) = select(j & half == 0, roll(x, -half), roll(x, +half))

with A/B host-built full-width coefficient vectors (d00/d11 resp.
d01/d10 tiled per span) -- same multiply count as the 2x2 form, perfect
lane utilization, rolls at full width.

Usage: python scripts/bench_extend_tpu.py [log_m] (default 18; reads
tree tables from .scale_cache/m{log_m}).
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

import numpy as np
import jax.numpy as jnp

from dvpari_tpu.ops import fr
from dvpari_tpu.storage import artifacts as art


def fetch(x):
    return np.asarray(jax.device_get(x))  # honest fence on axon


def timed(label, thunk, reps=3):
    thunk()  # warm (compile/load)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = thunk()
        r = r[0] if isinstance(r, (list, tuple)) else r
        # one-element fetch: drains the device queue without paying the
        # ~20 MB/s tunnel D2H of the full result (which otherwise floors
        # every measurement at ~1 s for a (20, 2^18) output)
        np.asarray(jax.device_get(r[:1, :1]))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:34s} {best*1e3:9.1f} ms  (reps {['%.0f' % (t*1e3) for t in ts]})", flush=True)
    return best


# --- flat-pass prototype ----------------------------------------------------

from functools import partial


@partial(jax.jit, static_argnums=(4,))
def _flat_butterfly(x, A, B, mask, half):
    sw = jnp.where(mask, jnp.roll(x, -half, axis=-1), jnp.roll(x, half, axis=-1))
    return fr.add(fr.mul(A, x), fr.mul(B, sw))


def flat_tables(dec_np, rec_np, n):
    """Host-tiled full-width (20, n) A/B per pass + partner masks."""
    passes = []
    # dec level j: span = n >> j, half = span/2, tables width half,
    # periodic over n/span subproblems
    for j, (d00, d01, d10, d11) in enumerate(dec_np):
        half = d00.shape[-1]
        span = 2 * half
        reps = n // span
        A = np.tile(np.concatenate([d00, d11], -1), (1, reps))
        B = np.tile(np.concatenate([d01, d10], -1), (1, reps))
        mask = np.tile(
            np.concatenate(
                [np.ones(half, bool), np.zeros(half, bool)]
            ),
            reps,
        )
        passes.append((jnp.asarray(A), jnp.asarray(B), jnp.asarray(mask), half))
    for j in reversed(range(len(rec_np))):
        r0, r0x, r1, r1x = rec_np[j]
        half = r0.shape[-1]
        span = 2 * half
        reps = n // span
        A = np.tile(np.concatenate([r0, r1x], -1), (1, reps))
        B = np.tile(np.concatenate([r0x, r1], -1), (1, reps))
        mask = np.tile(
            np.concatenate([np.ones(half, bool), np.zeros(half, bool)]),
            reps,
        )
        passes.append((jnp.asarray(A), jnp.asarray(B), jnp.asarray(mask), half))
    return passes


def flat_extend(x, passes):
    for A, B, mask, half in passes:
        x = _flat_butterfly(x, A, B, mask, half)
    return x


def main():
    log_m = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    m = 1 << log_m
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_cache", f"m{log_m}",
    )
    print("devices:", jax.devices(), flush=True)
    tree = art.read_fftree(os.path.join(cache, art.TREE_2N))
    import random

    rng = random.Random(42)
    ev_np = np.asarray(fr.from_int([rng.randrange(fr.P) for _ in range(m)]))
    ev = jnp.asarray(ev_np)
    fetch(ev)

    # reference: one full-width fr.mul
    mulj = jax.jit(fr.mul)
    timed("fr.mul (20, m)", lambda: mulj(ev, ev))

    # interleave cost probe (stack + reshape at s = m/2)
    @jax.jit
    def inter(a, b):
        st = jnp.stack([a, b], axis=-1)
        return st.reshape(fr.NLIMB, 2 * m)

    timed("interleave stack+reshape", lambda: inter(ev, ev))

    dec_np, rec_np = tree._extend_consts_np(0, "S1")

    # flat-pass prototype
    passes = flat_tables(dec_np, rec_np, m)
    got_flat = fetch(flat_extend(ev, passes))
    timed("flat-pass extend", lambda: flat_extend(ev, passes))

    # chunked engine
    os.environ["DVPARI_PASS_IMPL"] = "chunked"
    got_chunk = fetch(tree.extend(ev, "S1", 0))
    assert (got_chunk == got_flat).all(), "flat != chunked"
    timed("chunked extend", lambda: tree.extend(ev, "S1", 0))

    # fused per-shape program
    os.environ["DVPARI_PASS_IMPL"] = "fused"
    got_fused = fetch(tree.extend(ev, "S1", 0))
    assert (got_fused == got_flat).all(), "fused != flat"
    timed("fused extend", lambda: tree.extend(ev, "S1", 0))

    print("all outputs bit-identical", flush=True)


if __name__ == "__main__":
    main()
