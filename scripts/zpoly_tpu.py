"""Drive the device vanishing-poly product tree at scale on the TPU.

VERDICT item 4 'Done' criterion: z_coeffs at 2^18 on device, cross-
checked against enter-evaluation == 0 on the domain and a host spot
value.  Run from /root/repo (no PYTHONPATH): python scripts/zpoly_tpu.py [log2_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

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


def main():
    import jax.numpy as jnp

    from dvpari_tpu.ops import fr
    from dvpari_tpu.fftree.tree import FFTree
    from dvpari_tpu.fftree import precompute as pre

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n
    print("devices:", jax.devices(), "n = 2^%d" % log_n, flush=True)

    t0 = time.time()
    tree = FFTree.build(2 * n, False, log_n + 1)
    print(f"tree build: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    zc = tree.z_coeffs(1)  # device level-synchronous Karatsuba
    zc_np = np.asarray(jax.device_get(zc))
    dt = time.time() - t0
    print(f"z_coeffs(2^{log_n}): {dt:.1f}s  shape={zc_np.shape}", flush=True)

    t0 = time.time()
    evs = pre.evaluate_vanishing_poly_at_domain(zc, tree, 1)
    ok_zero = bool(np.all(np.asarray(jax.device_get(evs)) == 0))
    print(f"Z == 0 on D: {ok_zero}  ({time.time()-t0:.1f}s)", flush=True)

    # host spot check at one point
    z_int = fr.to_int(zc[..., :64])  # low coeffs only for sanity print
    lead = fr.to_int(zc[..., -1:])[0]
    assert lead == 1, "not monic"
    x0 = 0xDEADBEEF
    t0 = time.time()
    dom = fr.to_int(tree.leaves(1))
    expect = 1
    for d in dom:
        expect = expect * (x0 - d) % fr.P
    full = fr.to_int(zc)
    acc = 0
    for c in reversed(full):
        acc = (acc * x0 + c) % fr.P
    print(
        f"spot z({x0:#x}) match: {acc == expect}  ({time.time()-t0:.1f}s host)",
        flush=True,
    )
    assert ok_zero and acc == expect
    print("ZPOLY OK")


if __name__ == "__main__":
    main()
