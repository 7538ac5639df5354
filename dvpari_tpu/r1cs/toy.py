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


def synth_squaring_chain(n_rows: int):
    """Synthetic m-constraint circuit for scale tests: wire i+1 = wire_i^2
    plus two public-output rows (pads to m = next_pow2(n_rows + 2)).

    Returns (dump_bytes, public_inputs, private_witness).  Shared by the
    scale scripts (scripts/scale_e2e_tpu.py) and the sharded-prove tests;
    the role of the reference's SP1-scale test circuit
    (src/dvsnark_test.rs:184-244) without the 800 MB download.
    """
    from dvpari_tpu.ops import fr

    c1 = lambda w: (w, 0)
    rows = []
    first_chain = 3  # wires: 0=one, 1=pub o, 2=pub w, 3..=chain
    n_chain = n_rows
    for i in range(n_chain):
        a = first_chain + i
        rows.append(([c1(a)], [c1(a)], [c1(a + 1)]))
    last = first_chain + n_chain
    mid = first_chain + n_chain // 2
    rows.append(([c1(last)], [c1(0)], [c1(1)]))  # o = chain end
    rows.append(([c1(mid)], [c1(0)], [c1(2)]))  # w = chain middle
    x = 3
    chain = [x]
    for _ in range(n_chain):
        chain.append(chain[-1] * chain[-1] % fr.P)
    pub = [chain[-1], chain[n_chain // 2]]
    return gnark.write_sparse_r1cs([1], rows), pub, chain
