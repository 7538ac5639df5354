"""SP1/gnark sparse R1CS ingestion, SR1CS transform, witness loading.

Byte-compatible with the reference's binary formats
(reference: src/gnark_r1cs.rs:3-20 dump layout, :54-77 witness layout):

  R1CS dump (little-endian):
    u32 nbCoeffs; nbCoeffs x 32-byte big-endian field elements;
    u32 nbRows;  per row: u32 nL | u32 nR | u32 nO;
                 then (nL+nR+nO) x Term;  Term = (u32 wire_id, u32 coeff_id)
  Witness: u32 big-endian count; count x 32-byte big-endian elements.

TPU-first representation: each of the three matrices is CSR
(indptr / wire_ids / coeff_ids numpy arrays) so the sparse mat-vec in
the prover becomes gather + segment-sum over Fr limb arrays
(reference evaluates rows sequentially, src/proving.rs:348-403).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr
from dvpari_tpu.utils.blake3 import blake3_digest


@dataclass
class SparseMatrix:
    """CSR view of one of the L/R/O matrices."""

    indptr: np.ndarray  # int64[n_rows + 1]
    wire_ids: np.ndarray  # int32[nnz]
    coeff_ids: np.ndarray  # int32[nnz]


@dataclass
class R1CSInstance:
    """Parsed instance (reference: R1CSInstance, src/gnark_r1cs.rs:262-267).

    num_constraints is padded to a power of two
    (reference: src/gnark_r1cs.rs:291).
    """

    num_constraints: int
    num_public_inputs: int
    num_rows: int  # actual rows before padding
    l: SparseMatrix
    r: SparseMatrix
    o: SparseMatrix
    coeffs: list  # python ints (canonical Fr)
    has_vandermonde: bool = False


def load_sparse_r1cs(data: bytes) -> "tuple[list, list]":
    """Parse the dump; returns (coeff ints, rows as (l, r, o) term lists)."""
    off = 0
    (n_coeffs,) = struct.unpack_from("<I", data, off)
    off += 4
    coeffs = []
    for _ in range(n_coeffs):
        coeffs.append(int.from_bytes(data[off : off + 32], "big") % fr.P)
        off += 32
    (n_rows,) = struct.unpack_from("<I", data, off)
    off += 4
    rows = []
    for _ in range(n_rows):
        nl, nr, no = struct.unpack_from("<III", data, off)
        off += 12
        terms = np.frombuffer(data, dtype="<u4", count=2 * (nl + nr + no), offset=off)
        off += 8 * (nl + nr + no)
        terms = terms.reshape(-1, 2)
        rows.append((terms[:nl], terms[nl : nl + nr], terms[nl + nr :]))
    return coeffs, rows


def write_sparse_r1cs(coeffs: list, rows: list) -> bytes:
    """Inverse of load_sparse_r1cs (reference test-only writer,
    src/gnark_r1cs.rs:405-438)."""
    out = bytearray()
    out += struct.pack("<I", len(coeffs))
    for c in coeffs:
        out += int(c).to_bytes(32, "big")
    out += struct.pack("<I", len(rows))
    for l, r, o in rows:
        out += struct.pack("<III", len(l), len(r), len(o))
        for terms in (l, r, o):
            for wire, cid in np.asarray(terms, dtype=np.uint32).reshape(-1, 2):
                out += struct.pack("<II", int(wire), int(cid))
    return bytes(out)


def load_witness(data: bytes) -> list:
    """Witness file -> list of canonical Fr ints
    (reference: load_witness_from_file, src/gnark_r1cs.rs:188-198)."""
    (count,) = struct.unpack_from(">I", data, 0)
    off = 4
    out = []
    for _ in range(count):
        out.append(int.from_bytes(data[off : off + 32], "big") % fr.P)
        off += 32
    return out


def write_witness(values: list) -> bytes:
    out = bytearray(struct.pack(">I", len(values)))
    for v in values:
        out += int(v).to_bytes(32, "big")
    return bytes(out)


def _to_csr(rows_of_terms: list, n_rows_padded: int) -> SparseMatrix:
    indptr = np.zeros(n_rows_padded + 1, dtype=np.int64)
    wires, cids = [], []
    for i, terms in enumerate(rows_of_terms):
        terms = np.asarray(terms, dtype=np.uint32).reshape(-1, 2)
        indptr[i + 1] = indptr[i] + len(terms)
        if len(terms):
            wires.append(terms[:, 0].astype(np.int32))
            cids.append(terms[:, 1].astype(np.int32))
    for i in range(len(rows_of_terms), n_rows_padded):
        indptr[i + 1] = indptr[i]
    wire_ids = np.concatenate(wires) if wires else np.zeros(0, np.int32)
    coeff_ids = np.concatenate(cids) if cids else np.zeros(0, np.int32)
    return SparseMatrix(indptr, wire_ids, coeff_ids)


def instance_from_dump(data: bytes, num_public_inputs: int) -> R1CSInstance:
    """(reference: R1CSInstance::from_dump, src/gnark_r1cs.rs:282-296)"""
    coeffs, rows = load_sparse_r1cs(data)
    n_rows = len(rows)
    m = 1 if n_rows == 0 else 1 << (n_rows - 1).bit_length()
    return R1CSInstance(
        num_constraints=m,
        num_public_inputs=num_public_inputs,
        num_rows=n_rows,
        l=_to_csr([t[0] for t in rows], m),
        r=_to_csr([t[1] for t in rows], m),
        o=_to_csr([t[2] for t in rows], m),
        coeffs=list(coeffs),
    )


def add_vandermonde_matrix(inst: R1CSInstance, dom_elems: list) -> None:
    """In-place C -> C' rewrite: C'w = Cw - Dx with D_ij = d_i^j.

    Exact mirror of the reference's coefficient bookkeeping
    (reference: update_to_include_vandermode_matrix_d,
    src/gnark_r1cs.rs:333-386): the -1 coefficient is reused if present,
    and each -d_i^j (j >= 1) is appended as a fresh coefficient.
    """
    assert not inst.has_vandermonde
    m, k = inst.num_constraints, inst.num_public_inputs
    assert len(dom_elems) == m
    minus_one = (-1) % fr.P
    try:
        coeff_one_idx = inst.coeffs.index(minus_one)
    except ValueError:
        inst.coeffs.append(minus_one)
        coeff_one_idx = len(inst.coeffs) - 1

    new_wires = []
    new_cids = []
    for d in dom_elems:
        power = d % fr.P
        for j in range(k):
            if j == 0:
                cid = coeff_one_idx
            else:
                inst.coeffs.append((-power) % fr.P)
                cid = len(inst.coeffs) - 1
                power = power * d % fr.P
            new_wires.append(1 + j)
            new_cids.append(cid)

    # splice the k new terms per row into the O matrix CSR
    o = inst.o
    wire_ids = np.empty(len(o.wire_ids) + m * k, dtype=np.int32)
    coeff_ids = np.empty_like(wire_ids)
    indptr = np.zeros_like(o.indptr)
    pos = 0
    for i in range(m):
        s, e = int(o.indptr[i]), int(o.indptr[i + 1])
        row_len = e - s
        wire_ids[pos : pos + row_len] = o.wire_ids[s:e]
        coeff_ids[pos : pos + row_len] = o.coeff_ids[s:e]
        pos += row_len
        wire_ids[pos : pos + k] = new_wires[i * k : (i + 1) * k]
        coeff_ids[pos : pos + k] = new_cids[i * k : (i + 1) * k]
        pos += k
        indptr[i + 1] = pos
    inst.o = SparseMatrix(indptr, wire_ids, coeff_ids)
    inst.has_vandermonde = True


def coeffs_device(inst: R1CSInstance) -> jnp.ndarray:
    return jnp.asarray(fr.from_int(inst.coeffs))


from functools import partial


@partial(jax.jit, static_argnames=("n_rows",))
def _eval_csr_jit(coeffs_dev, witness_dev, wires, cids, seg, n_rows):
    terms = fr.mul(coeffs_dev[:, cids], witness_dev[:, wires])  # (20, nnz)
    sums = jax.ops.segment_sum(
        terms.T.astype(jnp.int32), seg, num_segments=n_rows
    ).T
    return fr.weak_normalize(sums)


def eval_matrix(
    mat: SparseMatrix, coeffs_dev: jnp.ndarray, witness_dev: jnp.ndarray
) -> jnp.ndarray:
    """Batched sparse mat-vec: out[i] = sum_terms coeff * w[wire].

    Gather + segment-sum over limb planes; raw int32 limb accumulation is
    exact for rows shorter than ~250k terms.
    (reference: eval_row loop, src/proving.rs:382-396)
    """
    n_rows = len(mat.indptr) - 1
    if len(mat.wire_ids) == 0:
        return fr.zeros((n_rows,))
    seg_ids = np.repeat(
        np.arange(n_rows, dtype=np.int32), np.diff(mat.indptr).astype(np.int64)
    )
    return _eval_csr_jit(
        coeffs_dev,
        witness_dev,
        jnp.asarray(mat.wire_ids),
        jnp.asarray(mat.coeff_ids),
        jnp.asarray(seg_ids),
        n_rows,
    )


def evaluate_monomial_basis_poly(public_inputs: list, alpha: int) -> int:
    """i(alpha) = sum_j x_j alpha^j (host ints)
    (reference: src/gnark_r1cs.rs:391-399)."""
    acc, power = 0, 1
    for x in public_inputs:
        acc = (acc + x * power) % fr.P
        power = power * alpha % fr.P
    return acc


def sp1_generate_scalar_from_raw_public_input(raw: int) -> int:
    """blake3(le64(raw)) truncated to its top 28 bytes, big-endian
    (reference: src/gnark_r1cs.rs:214-229)."""
    h = blake3_digest(struct.pack("<Q", raw))
    return int.from_bytes(h[4:], "big")
