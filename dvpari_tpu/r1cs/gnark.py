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
from functools import partial

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
    coeffs: np.ndarray  # Fr limbs int32[20, n_coeffs] (loose)
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


_jit_weak = jax.jit(fr.weak_normalize)
_jit_strong = jax.jit(fr.strong_normalize)


def _be32_to_loose_limbs(raw: np.ndarray) -> np.ndarray:
    """(n, 32) big-endian records -> loose Fr limbs int32[20, n] (device
    reduction, no python-int loops)."""
    if len(raw) == 0:
        return np.zeros((fr.NLIMB, 0), dtype=np.int32)
    wide = fr.limbs_from_be_bytes(raw)
    return np.asarray(jax.device_get(_jit_weak(jnp.asarray(wide))))


def load_witness_limbs(data: bytes) -> np.ndarray:
    """Vectorized witness loader: -> Fr limbs int32[20, count]
    (scale path; load_witness keeps the python-int contract for small
    inputs)."""
    (count,) = struct.unpack_from(">I", data, 0)
    raw = np.frombuffer(data, dtype=np.uint8, count=count * 32, offset=4)
    return _be32_to_loose_limbs(raw.reshape(count, 32))


def write_witness(values: list) -> bytes:
    out = bytearray(struct.pack(">I", len(values)))
    for v in values:
        out += int(v).to_bytes(32, "big")
    return bytes(out)


def _csr_from_counts(counts: np.ndarray, wires, cids, n_rows_padded: int) -> SparseMatrix:
    indptr = np.zeros(n_rows_padded + 1, dtype=np.int64)
    np.cumsum(counts.astype(np.int64), out=indptr[1 : len(counts) + 1])
    indptr[len(counts) + 1 :] = indptr[len(counts)]
    return SparseMatrix(
        indptr,
        np.asarray(wires, dtype=np.int32),
        np.asarray(cids, dtype=np.int32),
    )


def _parse_rows_numpy(data: bytes, rows_off: int):
    """Pure-python fallback row parser (native r1cs_parse_rows is the
    scale path); one cheap header read per row, one concatenate per
    matrix at the end."""
    (n_rows,) = struct.unpack_from("<I", data, rows_off)
    off = rows_off + 4
    counts = np.zeros((n_rows, 3), dtype=np.uint32)
    spans = []
    for i in range(n_rows):
        nl, nr, no = struct.unpack_from("<III", data, off)
        counts[i] = (nl, nr, no)
        off += 12
        spans.append(off)
        off += 8 * (nl + nr + no)
    all_terms = np.frombuffer(data, dtype="<u4")
    mats = []
    for k in range(3):
        w_parts, c_parts = [], []
        for i in range(n_rows):
            base = spans[i] // 4 + 2 * int(counts[i, :k].sum())
            t = all_terms[base : base + 2 * int(counts[i, k])]
            w_parts.append(t[0::2])
            c_parts.append(t[1::2])
        mats.append(
            (
                np.concatenate(w_parts) if w_parts else np.zeros(0, np.uint32),
                np.concatenate(c_parts) if c_parts else np.zeros(0, np.uint32),
            )
        )
    return counts, mats


def instance_from_dump(data: bytes, num_public_inputs: int) -> R1CSInstance:
    """(reference: R1CSInstance::from_dump, src/gnark_r1cs.rs:282-296)

    Fully vectorized: coefficients convert to Fr limbs on device in bulk,
    rows parse through the native C++ backend when available (the
    reference parallelizes this loop with rayon, src/gnark_r1cs.rs:144-179).
    """
    from dvpari_tpu import native

    (n_coeffs,) = struct.unpack_from("<I", data, 0)
    raw = np.frombuffer(data, dtype=np.uint8, count=32 * n_coeffs, offset=4)
    coeff_limbs = _be32_to_loose_limbs(raw.reshape(n_coeffs, 32))
    rows_off = 4 + 32 * n_coeffs

    parsed = native.r1cs_parse_rows(data, rows_off)
    if parsed is None:
        parsed = _parse_rows_numpy(data, rows_off)
    counts, mats = parsed
    n_rows = len(counts)
    m = 1 if n_rows == 0 else 1 << (n_rows - 1).bit_length()
    return R1CSInstance(
        num_constraints=m,
        num_public_inputs=num_public_inputs,
        num_rows=n_rows,
        l=_csr_from_counts(counts[:, 0], *mats[0], n_rows_padded=m),
        r=_csr_from_counts(counts[:, 1], *mats[1], n_rows_padded=m),
        o=_csr_from_counts(counts[:, 2], *mats[2], n_rows_padded=m),
        coeffs=coeff_limbs,
    )


@partial(jax.jit, static_argnames=("k",))
def _jit_neg_powers(dom, k):
    """-(d_i^j) for j = 1..k-1: int32[20, m, k-1] (i-major, j-minor when
    flattened)."""
    out = []
    power = dom
    for j in range(1, k):
        out.append(fr.neg(power))
        if j + 1 < k:
            power = fr.mul(power, dom)
    return jnp.stack(out, axis=-1)


def add_vandermonde_matrix(inst: R1CSInstance, dom) -> None:
    """In-place C -> C' rewrite: C'w = Cw - Dx with D_ij = d_i^j.

    Mirrors the reference's coefficient bookkeeping
    (reference: update_to_include_vandermode_matrix_d,
    src/gnark_r1cs.rs:333-386): the -1 coefficient is reused if present,
    and each -d_i^j (j >= 1) is appended as a fresh coefficient
    (i-major, j-minor order, as there).  Fully vectorized: powers on
    device, CSR splice via numpy scatter.

    dom: domain elements as device limbs int32[20, m] (or a list of ints).
    """
    assert not inst.has_vandermonde
    m, k = inst.num_constraints, inst.num_public_inputs
    if k == 0:  # no public inputs: D has zero columns, nothing to splice
        inst.has_vandermonde = True
        return
    if isinstance(dom, (list, tuple)):
        dom = jnp.asarray(fr.from_int(dom))
    assert dom.shape[-1] == m

    minus_one = fr.from_int(fr.P - 1)  # canonical limbs (20,)
    canon = np.asarray(jax.device_get(_jit_strong(jnp.asarray(inst.coeffs))))
    hits = np.nonzero((canon == minus_one[:, None]).all(axis=0))[0]
    coeffs = inst.coeffs
    if len(hits):
        coeff_one_idx = int(hits[0])
    else:
        coeffs = np.concatenate([coeffs, minus_one[:, None]], axis=1)
        coeff_one_idx = coeffs.shape[1] - 1
    base = coeffs.shape[1]

    new_cids = np.empty((m, k), dtype=np.int64)
    new_cids[:, 0] = coeff_one_idx
    if k > 1:
        negpow = np.asarray(jax.device_get(_jit_neg_powers(dom, k)))
        coeffs = np.concatenate(
            [coeffs, negpow.reshape(fr.NLIMB, m * (k - 1))], axis=1
        )
        new_cids[:, 1:] = base + (
            np.arange(m)[:, None] * (k - 1) + np.arange(k - 1)[None, :]
        )
    new_wires = np.broadcast_to(np.arange(1, k + 1, dtype=np.int64), (m, k))

    # splice the k new terms per row into the O matrix CSR (vectorized)
    o = inst.o
    nnz_old = len(o.wire_ids)
    counts_old = np.diff(o.indptr).astype(np.int64)
    wire_ids = np.empty(nnz_old + m * k, dtype=np.int32)
    coeff_ids = np.empty_like(wire_ids)
    row_of_old = np.repeat(np.arange(m, dtype=np.int64), counts_old)
    dest_old = np.arange(nnz_old, dtype=np.int64) + row_of_old * k
    wire_ids[dest_old] = o.wire_ids
    coeff_ids[dest_old] = o.coeff_ids
    dest_new = (o.indptr[1:].astype(np.int64) + np.arange(m) * k)[:, None] + np.arange(k)[None, :]
    wire_ids[dest_new.ravel()] = new_wires.ravel()
    coeff_ids[dest_new.ravel()] = new_cids.ravel()
    indptr = np.concatenate([[0], np.cumsum(counts_old + k)]).astype(np.int64)
    inst.o = SparseMatrix(indptr, wire_ids, coeff_ids)
    inst.coeffs = coeffs
    inst.has_vandermonde = True


def coeffs_device(inst: R1CSInstance) -> jnp.ndarray:
    return jnp.asarray(inst.coeffs)


# Raw int32 limb accumulation of weak-normalized products (|limb| <= 8300)
# is exact while a segment receives < 2^31 / 8300 ~ 258k terms in one pass;
# chunking the term axis at _SEG_CHUNK and re-normalizing between chunks
# makes the accumulation exact for ANY segment length (the reference's
# sequential loops have no such limit, src/proving.rs:382-396,
# src/srs.rs:53-84 - neither must we).
_SEG_CHUNK = 1 << 17  # 131072 * 8300 < 2^31 with 2x margin

_jit_add = jax.jit(fr.add)


@partial(jax.jit, static_argnames=("n_seg",))
def _seg_chunk_jit(coeffs_dev, vec_dev, cids, gids, seg, n_seg):
    terms = fr.mul(coeffs_dev[:, cids], vec_dev[:, gids])  # (20, chunk)
    # num_segments = n_seg + 1: padded tail terms target dummy segment n_seg
    sums = jax.ops.segment_sum(
        terms.T.astype(jnp.int32), seg, num_segments=n_seg + 1
    ).T
    return fr.weak_normalize(sums[:, :n_seg])


def sparse_accumulate(
    coeffs_dev: jnp.ndarray,
    vec_dev: jnp.ndarray,
    coeff_ids: np.ndarray,
    gather_ids: np.ndarray,
    seg_ids: np.ndarray,
    n_seg: int,
) -> jnp.ndarray:
    """out[s] = sum over terms t with seg_ids[t]==s of
    coeffs[coeff_ids[t]] * vec[gather_ids[t]]  -- exact for any segment
    length (chunked int32 limb accumulation, see _SEG_CHUNK)."""
    nnz = len(coeff_ids)
    if nnz == 0:
        return fr.zeros((n_seg,))
    if nnz <= _SEG_CHUNK:
        return _seg_chunk_jit(
            coeffs_dev, vec_dev, jnp.asarray(coeff_ids),
            jnp.asarray(gather_ids), jnp.asarray(seg_ids), n_seg,
        )
    pad = (-nnz) % _SEG_CHUNK
    cid = np.concatenate([coeff_ids, np.zeros(pad, np.int32)]).astype(np.int32)
    gid = np.concatenate([gather_ids, np.zeros(pad, np.int32)]).astype(np.int32)
    seg = np.concatenate([seg_ids, np.full(pad, n_seg)]).astype(np.int64)
    total = None
    for s in range(0, nnz + pad, _SEG_CHUNK):
        part = _seg_chunk_jit(
            coeffs_dev, vec_dev,
            jnp.asarray(cid[s : s + _SEG_CHUNK]),
            jnp.asarray(gid[s : s + _SEG_CHUNK]),
            jnp.asarray(seg[s : s + _SEG_CHUNK]), n_seg,
        )
        total = part if total is None else _jit_add(total, part)
    return total


def eval_matrix(
    mat: SparseMatrix, coeffs_dev: jnp.ndarray, witness_dev: jnp.ndarray
) -> jnp.ndarray:
    """Batched sparse mat-vec: out[i] = sum_terms coeff * w[wire].

    Gather + segment-sum over limb planes, chunked so int32 limb
    accumulation is exact for rows of any length.
    (reference: eval_row loop, src/proving.rs:382-396)
    """
    n_rows = len(mat.indptr) - 1
    if len(mat.wire_ids) == 0:
        return fr.zeros((n_rows,))
    seg_ids = np.repeat(
        np.arange(n_rows, dtype=np.int64), np.diff(mat.indptr).astype(np.int64)
    )
    return sparse_accumulate(
        coeffs_dev, witness_dev, mat.coeff_ids, mat.wire_ids, seg_ids, n_rows
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
