"""Generate the pinned golden vectors for tests/test_golden.py.

The values are derived once from the protocol constants (aux-curve
isogeny domains, vanishing/barycentric precomputes, FS transcript) after
cross-validation against the brute-force oracles in tests/test_fftree.py
and tests/test_precompute.py, then committed as literals so ANY drift in
domain construction, precompute algebra or transcript framing fails
loudly.  (reference: ec_fft.rs brute-force test formulas at N=16,
src/ec_fft.rs:628-1091)

Run on CPU: JAX_PLATFORMS=cpu python scripts/gen_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree.tree import FFTree
from dvpari_tpu.fftree import precompute as pre
from dvpari_tpu.protocol.transcript import Transcript

N = 16
TAU = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF12345678


def hexlist(ints):
    return "[\n    " + ",\n    ".join(f'"{v:#x}"' for v in ints) + ",\n]"


def main():
    tree2n = FFTree.build(2 * N, False, 5)
    dom, dom2 = tree2n.both_domains()
    dom_i = fr.to_int(dom)
    dom2_i = fr.to_int(dom2)

    z_poly = pre.compute_vanishing_polynomial(tree2n)
    z_i = fr.to_int(z_poly)

    bar = pre.compute_barycentric_weights(tree2n, z_poly)
    bar_i = fr.to_int(bar)

    import jax.numpy as jnp

    tau_dev = jnp.asarray(fr.from_int(TAU))
    ltau = pre.compute_lagrange_basis_at_tau(tree2n, z_poly, tau_dev, bar)
    ltau_i = fr.to_int(ltau)

    t = Transcript()
    t.srs_hash()
    t.circuit_info_hash()
    t.witness_commitment_hash([bytes(range(30)), bytes(range(1, 31))])
    t.public_input_hash([1, 2, 3])
    alpha = t.output()

    # transform fixtures: extend (evals on D -> evals on D') and enter
    # (coefficients -> evals over the full interleaved 2N-leaf domain)
    # for fixed deterministic inputs; brute-force re-derived in
    # tests/test_golden.py (reference oracle strategy: src/ec_fft.rs:883)
    ext_in = [(j * j + j + 1) % fr.P for j in range(N)]
    ext_out = fr.to_int(
        tree2n.extend(jnp.asarray(fr.from_int(ext_in)), "S1", 0)
    )
    ent_in = [(3 * j + 2) % fr.P for j in range(2 * N)]
    ent_out = fr.to_int(tree2n.enter(jnp.asarray(fr.from_int(ent_in)), 0))

    print("DOMAIN_D =", hexlist(dom_i))
    print("DOMAIN_DP =", hexlist(dom2_i))
    print("Z_POLY =", hexlist(z_i))
    print("BAR_WTS =", hexlist(bar_i))
    print(f'TAU = "{TAU:#x}"')
    print("L_TAU =", hexlist(ltau_i))
    print(f'ALPHA = "{alpha:#x}"')
    print("EXTEND_OUT =", hexlist(ext_out))
    print("ENTER_OUT =", hexlist(ent_out))


if __name__ == "__main__":
    main()
