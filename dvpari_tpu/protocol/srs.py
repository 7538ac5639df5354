"""Setup (SRS generation) and O(1) designated-verifier verification.

Mirrors the reference's setup/verify layer (reference: src/srs.rs):

  Setup (verifier-side, holds trapdoor tau/delta/epsilon):
    g_m[j]    = eps * m_j(tau, delta) * G      (one per wire)
    g_q[i]    = eps * Z_D(tau) delta^2 L'_i(tau) * G
    g_k[0][i] = L_i(tau) * G
    g_k[1][i] = L_i(tau) delta * G
    g_k[2][i] = L^U_i(tau) delta^2 * G         (unified 2m domain)

  Verify: alpha from transcript; i0 = i(alpha); r0 = a0 b0 - i0;
    u0 = (a0 + delta b0 + delta^2 r0) eps; v0 = (tau - alpha) eps;
    accept iff v0*K + u0*G == P and all decodings valid.

The TPU re-architecture: the ~5m sequential generator scalar-muls of the
reference (src/srs.rs:131-159, its hottest loop) become batched
fixed-base scalar-mul lanes, and accumulate_m_values' sequential sparse
accumulation (src/srs.rs:53-84) becomes gather + segment-sum by wire.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr, xsk233
from dvpari_tpu.fftree.tree import FFTree
from dvpari_tpu.fftree import precompute as pre
from dvpari_tpu.r1cs import gnark
from dvpari_tpu.storage import artifacts as art
from dvpari_tpu.protocol.transcript import Transcript
from dvpari_tpu.protocol.proof import Proof
from dvpari_tpu.utils import xsk233_host as host
from dvpari_tpu.utils.blake3 import blake3_digest
from dvpari_tpu.utils.timing import phase


@dataclass(frozen=True)
class Trapdoor:
    """(reference: Trapdoor, src/srs.rs:42-51)"""

    tau: int
    delta: int
    epsilon: int

    @classmethod
    def from_seed(cls, seed: bytes) -> "Trapdoor":
        """Deterministic trapdoor derivation (blake3-XOF-style counter).

        The reference samples via ChaCha20Rng + ark UniformRand
        (src/dvsnark_test.rs:149-154); the sampling scheme is not part of
        the protocol, only non-zeroness is (src/srs.rs:199-201).
        """
        vals = []
        ctr = 0
        while len(vals) < 3:
            v = int.from_bytes(
                blake3_digest(seed + ctr.to_bytes(4, "little")), "little"
            ) >> 24  # 232 bits
            ctr += 1
            if 0 < v < fr.P:
                vals.append(v)
        return cls(*vals)


def _gen_mul_batch(scalars: jnp.ndarray):
    """[s_i] G for a limb batch (20, n) -> host (proj words (3, 8, n),
    bit planes (3, 233, ceil32(n))), via the fixed-base tau-NAF ladder
    with native bulk recoding: large batches run bit-sliced against G's
    constant window table on the fused Pallas ladder (reference:
    xsk233_mulgen_frob fan-out, src/srs.rs:131-159).  Host outputs feed
    the artifact writer directly -- the SRS vectors never bounce back
    through the device."""
    return xsk233.mulgen_limbs_host(scalars)


_jit_scale = jax.jit(fr.mul)
_jit_add = jax.jit(fr.add)


def accumulate_m_values(
    inst: gnark.R1CSInstance, l_tau: jnp.ndarray, delta: int
) -> jnp.ndarray:
    """m_j = sum_i L_i(tau) (A_ij + delta B_ij + delta^2 C_ij) per wire j.

    (reference: accumulate_m_values, src/srs.rs:53-84 - sequential there,
    chunked segment-sum by wire here; exact for wires of any popularity,
    e.g. the constant-one wire appearing in millions of rows.)
    """
    n_wires = (
        max(
            int(inst.l.wire_ids.max(initial=0)),
            int(inst.r.wire_ids.max(initial=0)),
            int(inst.o.wire_ids.max(initial=0)),
        )
        + 1
    )
    coeffs_dev = gnark.coeffs_device(inst)
    d = int(delta) % fr.P
    scales = [1, d, d * d % fr.P]
    total = fr.zeros((n_wires,))
    m = l_tau.shape[-1]
    for mat, sc in zip((inst.l, inst.r, inst.o), scales):
        if len(mat.wire_ids) == 0:
            continue
        rows = np.repeat(
            np.arange(len(mat.indptr) - 1, dtype=np.int64),
            np.diff(mat.indptr).astype(np.int64),
        )
        lt = _jit_scale(l_tau, jnp.asarray(fr.from_int(sc)).reshape(fr.NLIMB, 1))
        part = gnark.sparse_accumulate(
            coeffs_dev, lt, mat.coeff_ids, rows, mat.wire_ids, n_wires
        )
        total = _jit_add(total, part)
    return total


def _load_or_build_tree(cache_dir, name, domain_len, shift, base_log_n):
    path = os.path.join(cache_dir, name)
    if art.fftree_exists(path):
        return art.read_fftree(path)
    tree = FFTree.build(domain_len, shift, base_log_n)
    art.write_fftree(path, tree)
    return tree


def verifier_runs_setup(
    trapdoor: Trapdoor,
    cache_dir: str,
    num_public_inputs: int,
    is_fresh_setup: bool = True,
    validate_precompute: bool = True,
):
    """Full setup pipeline (reference: SRS::verifier_runs_setup,
    src/srs.rs:177-361).  Returns the SRS point vectors (also cached).

    is_fresh_setup=False expects the domain precomputes (trees, vanishing
    polys, barycentric weights) to already be in cache_dir (downloaded,
    as the reference distinguishes, src/srs.rs:177-182) and fails fast if
    any is missing instead of silently recomputing."""
    os.makedirs(cache_dir, exist_ok=True)
    assert trapdoor.tau % fr.P and trapdoor.delta % fr.P and trapdoor.epsilon % fr.P
    if not is_fresh_setup:
        missing = [
            name
            for name in (art.Z_POLY, art.Z_POLYD, art.BAR_WTS, art.BAR_WTSD)
            if not os.path.exists(os.path.join(cache_dir, name))
        ] + [
            name
            for name in (art.TREE_2N, art.TREE_2ND)
            if not art.fftree_exists(os.path.join(cache_dir, name))
        ]
        assert not missing, (
            f"is_fresh_setup=False but precomputes missing from cache: {missing}"
        )

    with open(os.path.join(cache_dir, art.R1CS_CONSTRAINTS_FILE), "rb") as f:
        inst = gnark.instance_from_dump(f.read(), num_public_inputs)
    m = inst.num_constraints
    n_log = m.bit_length() - 1
    tau_dev = jnp.asarray(fr.from_int(trapdoor.tau))
    # overlap the singleton-program compiles with the pipeline
    pre.warm_protocol_programs(m)

    def domain_precomputes(tree_name, zf, bf, shift):
        with phase("setup.tree", tree=tree_name):
            tree2 = _load_or_build_tree(cache_dir, tree_name, 2 * m, shift, n_log + 1)
        zpath = os.path.join(cache_dir, zf)
        with phase("setup.vanishing", artifact=zf):
            if os.path.exists(zpath):
                z = art.read_fr_vec(zpath)
            else:
                z = pre.compute_vanishing_polynomial(tree2)
                art.write_fr_vec(zpath, z)
        if validate_precompute:
            # first use of the tree's enter/exit level programs: on a cold
            # compile cache this phase carries their XLA compiles (the m16
            # run spent ~1h40m here untimed -- keep it attributed)
            with phase("setup.validate_z", tree=tree_name):
                evs = pre.evaluate_vanishing_poly_at_domain(z, tree2, 1)
                from dvpari_tpu.protocol.prover import _jit_all_zero
                assert bool(_jit_all_zero(evs)), "vanishing poly invalid"
        bpath = os.path.join(cache_dir, bf)
        with phase("setup.barycentric", artifact=bf):
            if os.path.exists(bpath):
                bw = art.read_fr_vec(bpath)
            else:
                bw = pre.compute_barycentric_weights(tree2, z, 1)
                art.write_fr_vec(bpath, bw)
        with phase("setup.lagrange", tree=tree_name):
            ltau = pre.compute_lagrange_basis_at_tau(tree2, z, tau_dev, bw, 1)
        return tree2, z, bw, ltau

    tree2n, z_poly, _, l_tau = domain_precomputes(
        art.TREE_2N, art.Z_POLY, art.BAR_WTS, False
    )
    tree2nd, z_polyd, _, l_taud = domain_precomputes(
        art.TREE_2ND, art.Z_POLYD, art.BAR_WTSD, True
    )

    def z_inv(fname, z_coeffs, tree, d):
        path = os.path.join(cache_dir, fname)
        if os.path.exists(path):
            return art.read_fr_vec(path)
        vals = pre.evaluate_vanishing_poly_at_domain(z_coeffs, tree, d)
        vals = pre._jit_batch_inverse(vals)
        art.write_fr_vec(path, vals)
        return vals

    with phase("setup.z_inv"):
        z_vals2_inv = z_inv(art.Z_VALS2_INV, z_poly, tree2nd, 1)  # 1/Z_D on D'
        z_vals2d_inv = z_inv(art.Z_VALS2D_INV, z_polyd, tree2n, 1)  # 1/Z_D' on D

    with phase("setup.vandermonde"):
        gnark.add_vandermonde_matrix(inst, tree2n.leaves(1))

    with phase("setup.lagrange_unified"):
        l_taul = pre.lagrange_basis_unified(
            tau_dev, m, l_tau, l_taud, z_poly, z_polyd, z_vals2_inv, z_vals2d_inv
        )

    # memory plan: the trees and per-domain vectors are dead past this
    # point -- release them before the SRS fan-out allocates its point
    # vectors (the reference's clear_fftree discipline, src/srs.rs:86-101)
    del tree2n, tree2nd, z_polyd, z_vals2_inv, z_vals2d_inv

    # --- SRS matrices (reference: compute_srs_matrices, src/srs.rs:112-167)
    eps = trapdoor.epsilon % fr.P
    delta = trapdoor.delta % fr.P
    delta2 = delta * delta % fr.P

    with phase("setup.g_m"):
        m_vals = accumulate_m_values(inst, l_tau, delta)
        g_m, g_m_planes = _gen_mul_batch(
            _jit_scale(m_vals, jnp.asarray(fr.from_int(eps)).reshape(fr.NLIMB, 1))
        )
        art.write_point_vec(os.path.join(cache_dir, art.SRS_G_M), g_m, g_m_planes)
        del m_vals, g_m, g_m_planes

    with phase("setup.g_q"):
        z_tau_i = fr.to_int(pre._jit_poly_eval(z_poly, tau_dev))
        scale = z_tau_i * delta2 % fr.P * eps % fr.P
        g_q, g_q_planes = _gen_mul_batch(
            _jit_scale(l_taud, jnp.asarray(fr.from_int(scale)).reshape(fr.NLIMB, 1))
        )
        art.write_point_vec(os.path.join(cache_dir, art.SRS_G_Q), g_q, g_q_planes)
        del z_poly, l_taud, g_q, g_q_planes

    with phase("setup.g_k"):
        names = []
        for j, (l_slice, name) in enumerate(
            [(l_tau, art.SRS_G_K_0), (l_tau, art.SRS_G_K_1), (l_taul, art.SRS_G_K_2)]
        ):
            dp = [1, delta, delta2][j]
            gk, gk_planes = _gen_mul_batch(
                _jit_scale(l_slice, jnp.asarray(fr.from_int(dp)).reshape(fr.NLIMB, 1))
            )
            art.write_point_vec(os.path.join(cache_dir, name), gk, gk_planes)
            del gk, gk_planes
            names.append(name)

    # the SRS lives in the artifact cache (the reference also reloads it
    # from disk for proving); hand back paths, not multi-GB live arrays
    return {
        "g_m": os.path.join(cache_dir, art.SRS_G_M),
        "g_q": os.path.join(cache_dir, art.SRS_G_Q),
        "g_k": [os.path.join(cache_dir, n) for n in names],
    }


def verify(trapdoor: Trapdoor, public_inputs: "list[int]", proof: Proof) -> bool:
    """O(1) verification (reference: SRS::verify, src/srs.rs:374-428)."""
    commit_p, p_valid = host.decode_fast(proof.commit_p)
    kzg_k, k_valid = host.decode_fast(proof.kzg_k)

    t = Transcript()
    t.srs_hash()
    t.circuit_info_hash()
    t.public_input_hash(public_inputs)
    t.witness_commitment_hash([proof.commit_p])
    alpha = t.output()

    i0 = gnark.evaluate_monomial_basis_poly(public_inputs, alpha)
    r0 = (proof.a0 * proof.b0 - i0) % fr.P
    delta = trapdoor.delta % fr.P
    u0 = (
        (proof.a0 + delta * proof.b0 + delta * delta % fr.P * r0)
        % fr.P
        * trapdoor.epsilon
        % fr.P
    )
    v0 = (trapdoor.tau - alpha) % fr.P * trapdoor.epsilon % fr.P

    lhs = host.add(
        host.smul_fast(v0, kzg_k), host.smul_fast(u0, (host.GX, host.GY))
    )
    valid_inputs = p_valid and k_valid and proof.a0_valid and proof.b0_valid
    return bool(lhs == commit_p) and valid_inputs
