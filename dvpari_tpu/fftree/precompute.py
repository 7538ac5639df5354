"""Domain precompute algorithms on FFTrees (protocol layer L2 helpers).

Mirrors the polynomial precompute functions of the reference
(reference: src/ec_fft.rs:241-491): vanishing polynomial, barycentric
weights, Lagrange bases at tau, vanishing evaluations over the other
domain, and O(N) barycentric evaluation at the challenge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree.tree import FFTree
from dvpari_tpu.fftree.polyops import poly_derivative

_jit_poly_derivative = jax.jit(poly_derivative)
_jit_batch_inverse = jax.jit(lambda e: fr.batch_inverse(e, axis=0))
_jit_poly_eval = jax.jit(fr.poly_eval)


@jax.jit
def _jit_horner_step(tail, leaves, z0):
    return fr.add(fr.mul(tail, leaves), fr.broadcast_scalar(z0, leaves.shape[1:]))


@jax.jit
def _jit_lagrange_at_tau(z_coeffs, tau, bar_wts, leaves):
    z_tau = fr.poly_eval(z_coeffs, tau)
    diff_inv = fr.batch_inverse(
        fr.sub(fr.broadcast_scalar(tau, leaves.shape[1:]), leaves), axis=0
    )
    return fr.mul(
        fr.mul(fr.broadcast_scalar(z_tau, leaves.shape[1:]), diff_inv), bar_wts
    )


@jax.jit
def _jit_lagrange_unified(tau, l_tau, l_taud, z_poly, z_polyd, z2inv, z2dinv):
    m = l_tau.shape[-1]
    z_tau = fr.poly_eval(z_poly, tau)  # Z_D(tau)
    zd_tau = fr.poly_eval(z_polyd, tau)  # Z_D'(tau)
    even = fr.mul(fr.mul(l_tau, fr.broadcast_scalar(zd_tau, (m,))), z2dinv)
    odd = fr.mul(fr.mul(l_taud, fr.broadcast_scalar(z_tau, (m,))), z2inv)
    out = jnp.stack([even, odd], axis=-1)  # (20, m, 2)
    return out.reshape(fr.NLIMB, 2 * m)


@jax.jit
def _jit_barycentric_eval(domain, bar_wts, z_coeffs, p_evals, alpha):
    z_alpha = fr.poly_eval(z_coeffs, alpha)
    diff_inv = fr.batch_inverse(
        fr.sub(fr.broadcast_scalar(alpha, domain.shape[1:]), domain), axis=0
    )
    inner = fr.sum_along(fr.mul(fr.mul(p_evals, bar_wts), diff_inv), axis=0)
    return fr.mul(z_alpha, inner)


@jax.jit
def _jit_barycentric_eval3(domain, bar_wts, z_coeffs, pa, pb, pc, alpha):
    """Three barycentric evaluations at one alpha, sharing the Z(alpha)
    polynomial evaluation and the (alpha - d_i) batch inversion (the
    prover evaluates a, b, i at the same challenge,
    reference: src/proving.rs:561-594).  Also returns diff_inv =
    1/(alpha - d_i) so the k-scalar stage reuses it as
    1/(d_i - alpha) = -diff_inv instead of re-inverting."""
    z_alpha = fr.poly_eval(z_coeffs, alpha)
    diff_inv = fr.batch_inverse(
        fr.sub(fr.broadcast_scalar(alpha, domain.shape[1:]), domain), axis=0
    )
    wd = fr.mul(bar_wts, diff_inv)
    outs = tuple(
        fr.mul(z_alpha, fr.sum_along(fr.mul(p, wd), axis=0))
        for p in (pa, pb, pc)
    )
    return outs + (diff_inv,)



def warm_protocol_programs(m: int, n_pubs: int = 0, for_prove: bool = False):
    """Fire-and-forget concurrent compilation of the protocol layer's
    singleton jit programs for domain size m.

    The setup/prove pipelines otherwise pay each singleton's remote
    compile (~3-5 min on the tunneled backend) serially at first use;
    issuing them all from a background thread pool at pipeline start
    overlaps the compiles with the pipeline's own work (same idea as
    FFTree._warm for the per-level programs).  Zero-argument executions
    are valid for every program here (all are total functions; the
    protocol asserts live OUTSIDE the jitted bodies).  No-op when
    warming is disabled (local CPU backend without an explicit
    DVPARI_COMPILE_WORKERS)."""
    from dvpari_tpu.fftree.tree import _warm_workers

    nw = _warm_workers()
    if nw <= 1:
        return
    import threading
    from concurrent.futures import ThreadPoolExecutor

    def Z(*s):
        return jnp.zeros((fr.NLIMB,) + tuple(s), jnp.int32)

    jobs = [
        ("poly_derivative", lambda: _jit_poly_derivative(Z(m + 1))),
        ("batch_inverse", lambda: _jit_batch_inverse(Z(m))),
        ("poly_eval", lambda: _jit_poly_eval(Z(m + 1), Z())),
        ("horner_step", lambda: _jit_horner_step(Z(m), Z(m), Z())),
    ]
    import os
    from dvpari_tpu.fftree import chunked

    if (
        m > chunked.chunk_elems()
        and os.environ.get("DVPARI_PASS_IMPL", "chunked") == "chunked"
    ):
        # the domain transforms will run on the chunked pass engine:
        # overlap its (size-independent) program universe too
        jobs += chunked.warm_jobs()
    if not for_prove:
        from dvpari_tpu.ops import xsk233 as _xk

        jobs += [
            ("lagrange_at_tau",
             lambda: _jit_lagrange_at_tau(Z(m + 1), Z(), Z(m), Z(m))),
            ("lagrange_unified",
             lambda: _jit_lagrange_unified(
                 Z(), Z(m), Z(m), Z(m + 1), Z(m + 1), Z(m), Z(m))),
        ]
        # the SRS fan-out's device-recode + mulgen-ladder programs (all
        # fan-out batches are ~m wide, so one key set serves g_m/g_q/g_k)
        jobs += _xk.warm_fanout_jobs(m)
    else:
        from dvpari_tpu.protocol import prover as _pr

        jobs += [
            ("barycentric_eval3",
             lambda: _jit_barycentric_eval3(
                 Z(m), Z(m), Z(m + 1), Z(m), Z(m), Z(m), Z())),
            ("quotient",
             lambda: _pr._jit_quotient(Z(m), Z(m), Z(m), Z(m), Z(m))),
            ("k_scalars",
             lambda: _pr._jit_k_scalars(
                 Z(m), Z(m), Z(m), Z(m), Z(m), Z(), Z(), Z(), Z(), Z(m))),
            ("sat_check",
             lambda: _pr._jit_sat_check(Z(m), Z(m), Z(m), Z(m))),
            ("in_domain", lambda: _pr._jit_in_domain(Z(m), Z())),
        ]
        if n_pubs:
            # column count must match the real call site exactly
            # (prover.py _monomial_evals_over_domain builds pubs from
            # public_inputs alone -> n_pubs columns); the loop unrolls on
            # it, so an off-by-one warms a program that is never reused
            jobs.append(
                ("monomial_evals",
                 lambda: _pr._jit_monomial_evals(Z(n_pubs), Z(m)))
            )

    import os as _os

    trace = _os.environ.get("DVPARI_TRACE")

    def run_all():
        import time as _t

        t0 = _t.time()
        with ThreadPoolExecutor(max_workers=nw) as pool:
            list(pool.map(lambda j: j[1](), jobs))
        if trace:
            print(
                f"  [warm singletons {_t.time()-t0:.1f}s, "
                f"{len(jobs)} programs]",
                flush=True,
            )

    threading.Thread(target=run_all, daemon=True).start()


def compute_vanishing_polynomial(tree2n: FFTree) -> jnp.ndarray:
    """Coefficients (n+1, monic) of Z_D for D = tree2n's even moiety.

    Same result as the reference's vanish+exit+truncate pipeline
    (reference: compute_vanishing_polynomial, src/ec_fft.rs:241-282);
    computed via the product tree, and cross-checked against the
    exit path in tests.
    """
    return tree2n.z_coeffs(1)


def compute_barycentric_weights(
    tree: FFTree, z_coeffs: jnp.ndarray, d: int = 1
) -> jnp.ndarray:
    """1 / Z'(d_i) over the view(d) domain
    (reference: compute_barycentric_weights, src/ec_fft.rs:284-335)."""
    n = tree.n >> d
    zp = _jit_poly_derivative(z_coeffs)  # n coeffs (degree n-1)
    assert zp.shape[-1] == n
    evals = tree.enter(zp, d)
    return _jit_batch_inverse(evals)


def compute_lagrange_basis_at_tau(
    tree: FFTree,
    z_coeffs: jnp.ndarray,
    tau: jnp.ndarray,
    bar_wts: jnp.ndarray,
    d: int = 1,
) -> jnp.ndarray:
    """L_i(tau) = Z(tau) / ((tau - d_i) Z'(d_i))
    (reference: compute_lagrange_basis_at_tau, src/ec_fft.rs:340-390)."""
    leaves = tree.leaves(d)
    return _jit_lagrange_at_tau(z_coeffs, tau, bar_wts, leaves)


def evaluate_vanishing_poly_at_domain(
    z_coeffs: jnp.ndarray, tree: FFTree, d: int
) -> jnp.ndarray:
    """Evaluate Z (n+1 coeffs) over the n-point view(d) domain via
    enter on the degree-(n-1) tail + one Horner step
    (reference: evaluate_vanishing_poly_at_domain, src/ec_fft.rs:407-419)."""
    import numpy as np

    leaves = tree.leaves(d)
    zc = np.asarray(jax.device_get(z_coeffs))  # host slice: no eager device op
    tail = tree.enter(jnp.asarray(np.ascontiguousarray(zc[..., 1:])), d)
    return _jit_horner_step(tail, leaves, jnp.asarray(zc[..., 0]))


def lagrange_basis_unified(
    tau: jnp.ndarray,
    num_constraints: int,
    l_tau: jnp.ndarray,
    l_taud: jnp.ndarray,
    z_poly: jnp.ndarray,
    z_polyd: jnp.ndarray,
    z_vals2_inv: jnp.ndarray,
    z_vals2d_inv: jnp.ndarray,
) -> jnp.ndarray:
    """Lagrange basis over D u D' (interleaved) from the per-domain bases
    (reference: compute_lagrange_basis_at_tau_over_unified_domain,
    src/ec_fft.rs:424-450; argument mapping as at src/srs.rs:337-346)."""
    assert l_tau.shape[-1] == num_constraints
    return _jit_lagrange_unified(
        tau, l_tau, l_taud, z_poly, z_polyd, z_vals2_inv, z_vals2d_inv
    )


def barycentric_eval_at_alpha(
    domain: jnp.ndarray,
    bar_wts: jnp.ndarray,
    z_coeffs: jnp.ndarray,
    p_evals: jnp.ndarray,
    alpha: jnp.ndarray,
) -> jnp.ndarray:
    """P(alpha) = Z(alpha) * sum_i y_i w_i / (alpha - d_i), O(N)
    (reference: evaluate_poly_at_alpha_using_barycentric_weights,
    src/ec_fft.rs:455-491)."""
    return _jit_barycentric_eval(domain, bar_wts, z_coeffs, p_evals, alpha)


def barycentric_eval3_at_alpha(domain, bar_wts, z_coeffs, pa, pb, pc, alpha):
    """(a0, b0, i0, diff_inv): fused three-poly barycentric evaluation;
    diff_inv = 1/(alpha - d_i) for downstream reuse."""
    return _jit_barycentric_eval3(domain, bar_wts, z_coeffs, pa, pb, pc, alpha)
