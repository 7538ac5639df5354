"""The 5-constraint toy circuit, byte-identical to the reference's dump.

(reference: create_five_constraint_dump_on_a_file,
src/dvsnark_test.rs:34-128)

Wires: 0 = one, 1 = o, 2 = w, 3 = y, 4 = z, 5 = x, 6 = t, 7 = s
Constraints:
  x*x = y;  (y+z)*1 = w;  (2z)*1 = t;  (x+t)*1 = s;  (w+s)*1 = o
Public inputs: [o, w]; private witness: [y, z, x, t, s].
"""

from __future__ import annotations

from dvpari_tpu.r1cs import gnark


def toy_r1cs_dump() -> bytes:
    coeffs = [1, 2]
    c1 = lambda w: (w, 0)
    c2 = lambda w: (w, 1)
    ONE, O, W, Y, Z, X, T, S = range(8)
    rows = [
        ([c1(X)], [c1(X)], [c1(Y)]),
        ([c1(Y), c1(Z)], [c1(ONE)], [c1(W)]),
        ([c2(Z)], [c1(ONE)], [c1(T)]),
        ([c1(X), c1(T)], [c1(ONE)], [c1(S)]),
        ([c1(W), c1(S)], [c1(ONE)], [c1(O)]),
    ]
    return gnark.write_sparse_r1cs(coeffs, rows)


def toy_witness():
    """Returns (public_inputs, private_inputs) satisfying the circuit
    (reference: src/dvsnark_test.rs:136-147)."""
    x = 3
    y = x * x
    z = 4
    w = y + z
    t = 2 * z
    s = x + t
    o = w + s
    return [o, w], [y, z, x, t, s]
