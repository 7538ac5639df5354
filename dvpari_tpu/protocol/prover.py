"""Prover: precompute preparation and proof generation.

Mirrors the reference prover pipeline (reference: src/proving.rs):
  prover_prepares_precomputes (:225-325) and Proof::prove (:426-688),
re-architected as batched device stages:

  sparse mat-vec (gather+segment-sum)  ->  MSM(w, g_m)
  extend a,b,c,i to D' (ECFFT)         ->  quotient q = (ab - i - c)/Z
  MSM(q, g_q), commit_p = both         ->  Fiat-Shamir alpha
  barycentric a0,b0,i0 at alpha        ->  k-scalar vectors
  MSM([k_a||k_b||k_r], g_k)            ->  Proof (944 bits)
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr, xsk233
from dvpari_tpu.fftree import precompute as pre
from dvpari_tpu.r1cs import gnark
from dvpari_tpu.storage import artifacts as art
from dvpari_tpu.protocol.transcript import Transcript
from dvpari_tpu.protocol.proof import Proof
from dvpari_tpu.protocol.srs import _load_or_build_tree
from dvpari_tpu.utils import xsk233_host as host
from dvpari_tpu.utils.timing import phase, fence


def prover_prepares_precomputes(cache_dir: str, validate_precompute: bool = True):
    """Ensure tree2n / bar_wts / z_vals2inv exist; z_poly is a required
    input (reference: prover_prepares_precomputes, src/proving.rs:225-325)."""
    os.makedirs(cache_dir, exist_ok=True)
    z_poly = art.read_fr_vec(os.path.join(cache_dir, art.Z_POLY))
    m = z_poly.shape[-1] - 1
    n_log = m.bit_length() - 1

    tree2n = _load_or_build_tree(cache_dir, art.TREE_2N, 2 * m, False, n_log + 1)

    bpath = os.path.join(cache_dir, art.BAR_WTS)
    if not os.path.exists(bpath):
        bw = pre.compute_barycentric_weights(tree2n, z_poly, 1)
        art.write_fr_vec(bpath, bw)
    zpath = os.path.join(cache_dir, art.Z_VALS2_INV)
    if not os.path.exists(zpath):
        # evaluate Z_D over D' (odd moiety of tree2n): full-leaf eval, odd half
        full = _eval_z_all_leaves(tree2n, z_poly)
        vals = pre._jit_batch_inverse(full[:, 1::2])
        art.write_fr_vec(zpath, vals)
    if validate_precompute:
        evs = pre.evaluate_vanishing_poly_at_domain(z_poly, tree2n, 1)
        assert bool(_jit_all_zero(evs)), "vanishing poly invalid over D"


def _eval_z_all_leaves(tree2n, z_poly):
    """Evaluate the (m+1)-coeff Z over all 2m leaves via enter + Horner
    tail (host-side padding: eager device slices are remote compiles on
    the tunneled backend)."""
    leaves = tree2n.leaves(0)
    n = leaves.shape[-1]
    zc = np.asarray(jax.device_get(z_poly))
    padded = np.zeros((fr.NLIMB, n), dtype=np.int32)
    padded[:, : zc.shape[-1] - 1] = zc[:, 1:]
    tail = tree2n.enter(jnp.asarray(padded), 0)
    return pre._jit_horner_step(tail, leaves, jnp.asarray(zc[..., 0]))


@jax.jit
def _jit_monomial_evals(pubs: jnp.ndarray, dom: jnp.ndarray) -> jnp.ndarray:
    """i(d) = sum_j pubs[:, j] d^j over the domain; pubs int32[20, k]."""
    m = dom.shape[-1]
    k = pubs.shape[-1]
    acc = fr.zeros((m,))
    power = fr.ones((m,))
    for j in range(k):
        xd = jnp.broadcast_to(pubs[:, j : j + 1], (fr.NLIMB, m))
        acc = fr.add(acc, fr.mul(xd, power))
        if j + 1 < k:
            power = fr.mul(power, dom)
    return acc


def _monomial_evals_over_domain(public_inputs, dom: jnp.ndarray) -> jnp.ndarray:
    pubs = jnp.asarray(fr.from_int([int(x) for x in public_inputs]))
    return _jit_monomial_evals(pubs, dom)


@jax.jit
def _jit_sat_check(a, b, c, i):
    return jnp.all(fr.is_zero(fr.sub(fr.mul(a, b), fr.add(c, i))))


_jit_all_zero = jax.jit(lambda v: jnp.all(fr.is_zero(v)))


@jax.jit
def _jit_quotient(a2, b2, i2, c2, z2inv):
    r2 = fr.sub(fr.mul(a2, b2), i2)
    return r2, fr.mul(fr.sub(r2, c2), z2inv)


@jax.jit
def _jit_k_scalars(dom2, a_vals, b_vals, i_vals, r2, a0, b0, i0, alpha_dev, diff_inv):
    m = dom2.shape[-1]
    r0 = fr.sub(fr.mul(a0, b0), i0)
    bc = lambda v: fr.broadcast_scalar(v, (m,))
    # 1/(d_i - alpha) = -1/(alpha - d_i): reuse the barycentric stage's
    # batch inversion over D instead of re-inverting
    denom_inv = fr.neg(diff_inv)
    denom_inv2 = fr.batch_inverse(fr.sub(dom2, bc(alpha_dev)), axis=0)
    k_a = fr.mul(fr.sub(a_vals, bc(a0)), denom_inv)
    k_b = fr.mul(fr.sub(b_vals, bc(b0)), denom_inv)
    r_vals = fr.sub(fr.mul(a_vals, b_vals), i_vals)
    kr1 = fr.mul(fr.sub(r_vals, bc(r0)), denom_inv)
    kr2 = fr.mul(fr.sub(r2, bc(r0)), denom_inv2)
    # interleave [kr(D_i), kr(D'_i)] (reference: src/proving.rs:644-654)
    k_r = jnp.stack([kr1, kr2], axis=-1).reshape(fr.NLIMB, 2 * m)
    return jnp.concatenate([k_a, k_b, k_r], axis=-1)


_jit_point_add = jax.jit(xsk233.add)

_jit_in_domain = jax.jit(
    lambda dom, a: jnp.any(fr.eq(dom, fr.broadcast_scalar(a, dom.shape[1:])))
)


_ctx_cache: dict = {}


def _prove_context(cache_dir: str, n_pubs: int):
    """Per-circuit host context -- (z_poly, tree2n, parsed instance with
    the Vandermonde splice applied) -- cached across prove() calls.

    Repeated proves over one circuit are the production serving pattern
    and the reference's own benchmark shape (prove loops over fresh
    witnesses, src/dvsnark_test.rs:184-244; its SRS/tree artifacts stay
    loaded between iterations).  Re-reading the 2n-leaf tree and
    re-parsing the R1CS dump cost 3.4 s + 1.8 s of the 23.2 s warm
    prove at m=2^18 (JOURNAL r5 ladder).  Single slot (most recent
    circuit) bounds host RAM; keyed by realpath + n_pubs and stamped
    with the z_poly/r1cs artifact mtimes so a regenerated cache
    invalidates."""
    key = (os.path.realpath(cache_dir), n_pubs)
    r1cs_path = os.path.join(cache_dir, art.R1CS_CONSTRAINTS_FILE)
    z_path = os.path.join(cache_dir, art.Z_POLY)

    def _stamp():
        return (os.path.getmtime(z_path), os.path.getmtime(r1cs_path))

    hit = _ctx_cache.get(key)
    if hit is not None and hit[0] == _stamp():
        return hit[1]
    z_poly = art.read_fr_vec(z_path)
    m = z_poly.shape[-1] - 1
    n_log = m.bit_length() - 1
    tree2n = _load_or_build_tree(cache_dir, art.TREE_2N, 2 * m, False, n_log + 1)
    with phase("prove.r1cs"):
        with open(r1cs_path, "rb") as f:
            inst = gnark.instance_from_dump(f.read(), n_pubs)
        assert inst.num_constraints == m
        gnark.add_vandermonde_matrix(inst, tree2n.both_domains()[0])
    ctx = (z_poly, tree2n, inst)
    _ctx_cache.clear()
    _ctx_cache[key] = (_stamp(), ctx)
    return ctx


def prove(
    cache_dir: str,
    public_inputs: "list[int]",
    private_inputs: "list[int]",
    mesh=None,
) -> Proof:
    """(reference: Proof::prove, src/proving.rs:426-688)

    With a mesh, the production pipeline itself runs sharded: the three
    MSMs shard their points/window codes across devices (partials fold
    over ICI) and the four ECFFT extends plus the elementwise stages run
    on domain-sharded vectors, with GSPMD inserting the cross-shard
    butterfly collectives.  Proof bytes are identical either way (the
    sharded fold is the same pairwise tree)."""
    with phase("prove.load_tree"):
        z_poly, tree2n, inst = _prove_context(cache_dir, len(public_inputs))
        m = z_poly.shape[-1] - 1
        # overlap the singleton-program compiles with the pipeline
        pre.warm_protocol_programs(m, len(public_inputs), for_prove=True)
        dom, dom2 = tree2n.both_domains()

    with phase("prove.witness"):
        head = fr.from_int([1] + [int(x) % fr.P for x in public_inputs])
        if isinstance(private_inputs, (np.ndarray, jnp.ndarray)):
            # scale path: private inputs pre-converted to limbs
            # (gnark.load_witness_limbs), no python-int loop over the witness
            w_dev = jnp.concatenate(
                [jnp.asarray(head), jnp.asarray(private_inputs)], axis=-1
            )
        else:
            w_dev = jnp.asarray(
                np.concatenate(
                    [head, fr.from_int([int(x) % fr.P for x in private_inputs])],
                    axis=-1,
                )
            )
        n_wires = int(w_dev.shape[-1])

    with phase("prove.matvec"):
        coeffs_dev = gnark.coeffs_device(inst)
        a_vals = gnark.eval_matrix(inst.l, coeffs_dev, w_dev)
        b_vals = gnark.eval_matrix(inst.r, coeffs_dev, w_dev)
        c_vals = gnark.eval_matrix(inst.o, coeffs_dev, w_dev)
        i_vals = _monomial_evals_over_domain(public_inputs, dom)
        fence(a_vals, b_vals, c_vals, i_vals)

    if mesh is not None and m % mesh.devices.size == 0:
        # domain-shard the evaluation vectors: every downstream stage
        # (extend, quotient, barycentric, k-scalars) then runs sharded
        # under GSPMD
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dvpari_tpu.parallel.mesh import SHARD_AXIS

        shard_vec = NamedSharding(mesh, P(None, SHARD_AXIS))
        a_vals, b_vals, c_vals, i_vals = (
            jax.device_put(v, shard_vec)
            for v in (a_vals, b_vals, c_vals, i_vals)
        )

    # witness satisfaction: a*b == c + i on D (reference asserts per row,
    # src/proving.rs:388-395).  The bool() fetch drains the device queue,
    # so this phase also absorbs the matvec/monomial execution.
    with phase("prove.sat_check"):
        assert bool(_jit_sat_check(a_vals, b_vals, c_vals, i_vals)), (
            "witness does not satisfy the SR1CS relation"
        )

    with phase("prove.msm_gm", n=n_wires):
        gm_path = os.path.join(cache_dir, art.SRS_G_M)
        assert art.point_vec_len(gm_path) == n_wires
        # lazy loaders: the bit-sliced path reads only the planes sidecar
        msm_gm = xsk233.msm_limbs(
            w_dev, lambda: art.read_point_vec(gm_path), mesh=mesh,
            planes=lambda: art.read_point_vec_planes_device(gm_path)
            if mesh is None else art.read_point_vec_planes(gm_path),
        )
        fence(msm_gm)
        del w_dev

    transcript = Transcript()
    transcript.circuit_info_hash(inst)
    transcript.public_input_hash(public_inputs)

    with phase("prove.extend", n=4 * m):
        a2 = tree2n.extend(a_vals, "S1", 0)
        b2 = tree2n.extend(b_vals, "S1", 0)
        c2 = tree2n.extend(c_vals, "S1", 0)
        i2 = tree2n.extend(i_vals, "S1", 0)
        fence(a2, b2, c2, i2)
    # c is dead past its extend; at 2^23 every (20, m) vector is ~640 MB
    # of HBM, so drop references as the reference frees mid-pipeline
    # (clear_fftree discipline, src/srs.rs:86-101)
    del c_vals

    with phase("prove.quotient"):
        z2inv = art.read_fr_vec(os.path.join(cache_dir, art.Z_VALS2_INV))
        r2, q2 = _jit_quotient(a2, b2, i2, c2, z2inv)
        fence(r2, q2)
        del a2, b2, c2, i2, z2inv

    with phase("prove.msm_gq", n=m):
        gq_path = os.path.join(cache_dir, art.SRS_G_Q)
        assert art.point_vec_len(gq_path) == m
        msm_q = xsk233.msm_limbs(
            q2, lambda: art.read_point_vec(gq_path), mesh=mesh,
            planes=lambda: art.read_point_vec_planes_device(gq_path)
            if mesh is None else art.read_point_vec_planes(gq_path),
        )
        fence(msm_q)
        del q2

    commit_p = _jit_point_add(msm_q, msm_gm)
    commit_p_bytes = host.encode(xsk233.to_affine_int(commit_p))
    transcript.witness_commitment_hash([commit_p_bytes])
    transcript.srs_hash()

    with phase("prove.challenge"):
        alpha = transcript.output()
        alpha_dev = jnp.asarray(fr.from_int(alpha))
        # alpha not in D u D' (reference asserts per element,
        # src/proving.rs:548-556); device-side membership check
        assert not bool(_jit_in_domain(dom, alpha_dev)) and not bool(
            _jit_in_domain(dom2, alpha_dev)
        ), "challenge in domain (prob ~2^-200)"

    with phase("prove.evaluate_at_alpha"):
        bar_wts = art.read_fr_vec(os.path.join(cache_dir, art.BAR_WTS))
        a0, b0, i0, diff_inv = pre.barycentric_eval3_at_alpha(
            dom, bar_wts, z_poly, a_vals, b_vals, i_vals, alpha_dev
        )
        fence(a0, b0, i0)

    with phase("prove.k_scalars"):
        s_k_all = _jit_k_scalars(
            dom2, a_vals, b_vals, i_vals, r2, a0, b0, i0, alpha_dev, diff_inv
        )
        fence(s_k_all)
        del a_vals, b_vals, i_vals, r2

    with phase("prove.msm_gk", n=4 * m):
        gk_paths = [
            os.path.join(cache_dir, name)
            for name in (art.SRS_G_K_0, art.SRS_G_K_1, art.SRS_G_K_2)
        ]
        seg_lens = [art.point_vec_len(p) for p in gk_paths]
        assert sum(seg_lens) == 4 * m, (seg_lens, m)

        def _gk_points():
            return jnp.concatenate(
                [art.read_point_vec(p) for p in gk_paths], axis=-1
            )

        # the three g_k segments are 2m/m/m long: concatenated planes
        # stay slot-aligned because each segment is a multiple of 32
        # at production sizes; fall back to fresh packing otherwise.
        # Unsharded: per-segment device-cached uploads + device concat
        # (no per-prove H2D of the 4m-point vector).
        def _gk_planes():
            import numpy as _np

            if all(n % 32 == 0 for n in seg_lens):
                if mesh is None:
                    return jnp.concatenate(
                        [art.read_point_vec_planes_device(p) for p in gk_paths],
                        axis=-1,
                    )
                return _np.concatenate(
                    [art.read_point_vec_planes(p) for p in gk_paths], axis=-1
                )
            return None

        kzg_k = xsk233.msm_limbs(
            s_k_all, _gk_points, mesh=mesh, planes=_gk_planes
        )

    return Proof(
        commit_p=commit_p_bytes,
        kzg_k=host.encode(xsk233.to_affine_int(kzg_k)),
        a0=fr.to_int(a0),
        b0=fr.to_int(b0),
    )
