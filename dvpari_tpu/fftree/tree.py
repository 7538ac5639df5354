"""FFTree: the ECFFT polynomial engine over Fr, TPU-batched.

Replaces the reference's `ecfft` crate fork (reference: Cargo.toml:39;
consumed throughout src/ec_fft.rs).  The FFTree is the data structure
enabling quasi-linear polynomial ops over Fr domains built from an
isogeny chain on the auxiliary curve:

* `extend`  - evals on one moiety -> evals on the other (O(N log N)).
              The only op the prover needs (reference: src/proving.rs:410-422).
* `enter`   - coefficients -> evals on all leaves (O(N log^2 N)).
* `exit`    - evals -> coefficients (interpolation).
* vanishing - coefficients / cross-moiety evaluations of Z_S.

Design notes (TPU-first):
- The recursive ECFFT algorithms are restructured as *iterative
  level-synchronous passes*: at depth k all 2^k subproblems live in one
  array `(20, ..., V, s)` (limb axis, batch axes, subproblem axis,
  domain axis), so each level is a handful of large elementwise Fr ops -
  no per-node recursion, no gather/scatter, uniform control flow.
- A subtree (`subtree_with_size`, reference: src/ec_fft.rs:21-25) is a
  *view*: stride-2^d slices of the same layer arrays.  The isogeny chain
  is shared - the subtree over even leaves uses the identical isogenies,
  so no extra storage.
- Decompose/recombine 2x2 matrices (the reference FFTree's
  `decompose_matrices` / `recombine_matrices` fields, src/srs.rs:86-101)
  are derived from the pair decomposition
  P(x) = (U0(psi(x)) + x U1(psi(x))) * v(x)^(deg/2) and cached per
  (view, moiety); a "minimal tree" is one that only caches the top-level
  S1 consts (reference: src/tree_io.rs:353-433 semantics).
- `exit` uses P = A + Z0*B with batched-Karatsuba coefficient combine;
  the extends inside are shared with the forward path.  Results are
  representation-independent polynomial operations, hence bit-identical
  to the reference's outputs on the same domains.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree import aux_curve
from dvpari_tpu.fftree.polyops import polymul, vanishing_poly_coeffs


# Concurrent XLA compile workers for the per-level programs.  The level
# loops (enter/exit) otherwise compile serially -- on the tunneled TPU
# backend each per-level program is a ~3-5 min remote compile, which made
# a cold 2^16 setup spend ~1h40m in setup.validate_z (JOURNAL.md round 4).
# Compile RPCs release the GIL, so a small thread pool overlaps them.
# On the LOCAL CPU backend compiles are CPU-bound on the same 4 cores --
# parallelizing them there just thrashes (and slowed the multichip
# dryrun past its timeout), so warming defaults off unless the env var
# asks for it explicitly.  1 disables warming (old serial behavior).


def _warm_workers() -> int:
    env = os.environ.get("DVPARI_COMPILE_WORKERS")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass  # malformed env: fall back to the backend default
    try:
        return 4 if jax.default_backend() != "cpu" else 1
    except Exception:
        return 1


def _env_int(name: str, default: int) -> int:
    """Env-int parse with fallback (a malformed value must degrade to the
    default, not raise deep inside setup/prove)."""
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default

# Shared jit wrappers for the module-level transform bodies (see
# FFTree._jitted) and the module-wide warmed-program set (a second tree
# instance at the same shapes must not re-warm).
_MOD_JITS: dict = {}
_MOD_WARMED: set = set()

# Largest domain whose vanishing-poly product tree runs as python-int
# schoolbook.  Above this the GMP Kronecker-substitution tree
# (utils/kronecker.py) takes over; tests shrink it to exercise the
# Kronecker path cheaply.
HOST_ZC_MAX = 4096


def _log2(n: int) -> int:
    assert n & (n - 1) == 0
    return n.bit_length() - 1


def _cpu_device():
    """The local CPU device (table prep runs there: local compiles are
    fast and free; the tunneled TPU pays ~45 s per remote compile)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _host_vanishing_coeffs(points: "list[int]") -> "list[int]":
    """prod (x - s_i) coefficients via a python-int product tree."""
    polys = [[(-s) % fr.P, 1] for s in points]
    while len(polys) > 1:
        nxt = []
        for a, b in zip(polys[0::2], polys[1::2]):
            out = [0] * (len(a) + len(b) - 1)
            for i, ai in enumerate(a):
                if ai:
                    for j, bj in enumerate(b):
                        out[i + j] = (out[i + j] + ai * bj) % fr.P
            nxt.append(out)
        polys = nxt
    return polys[0]


def _bcast(consts: jnp.ndarray, state_ndim: int) -> jnp.ndarray:
    """(20, h) level constants -> (20, 1...1, h) against (20, *B, V, s)."""
    return consts.reshape(
        (fr.NLIMB,) + (1,) * (state_ndim - 2) + (consts.shape[-1],)
    )


class FFTree:
    """ECFFT tree over a 2^L-point coset domain of the auxiliary curve."""

    def __init__(self, layers, x0s, shift_by_one: bool, base_log_n: int):
        self.layers = layers  # list of jnp int32 (20, n_l), l = 0..L
        self.x0s = x0s  # python ints, per layer with an isogeny
        self.n = layers[0].shape[-1]
        self.shift_by_one = shift_by_one
        self.base_log_n = base_log_n
        self._ext_cache: dict = {}
        self._xnn_cache: dict = {}
        self._zc_cache: dict = {}
        self._zc_np_cache: dict = {}
        self._z0odd_cache: dict = {}
        self._jit_cache: dict = {}
        self._np_cache: dict = {}
        self._dev_cache: dict = {}
        self._warmed: set = set()
        # When the tree is an on-disk artifact, its derived tables
        # (extend constants, x^n powers, z-chains) persist next to it:
        # they are pure functions of the tree, and recomputing them costs
        # ~20 min of local XLA compiles + device enters per PROCESS at
        # 2^17+ (in-memory caches die with the process; the persistent
        # compile cache does not cover the poisoned-AOT CPU entries).
        # Set by storage/artifacts.py read_fftree/write_fftree.
        self.table_dir: "str | None" = None

    def _table_path(self, name: str) -> "str | None":
        if not self.table_dir:
            return None
        import os

        os.makedirs(self.table_dir, exist_ok=True)
        return os.path.join(self.table_dir, name + ".npz")

    def _table_load(self, name: str):
        import os

        p = self._table_path(name)
        if p and os.path.exists(p):
            return np.load(p)
        return None

    # -- construction -------------------------------------------------------

    @classmethod
    def build(
        cls,
        domain_len: int,
        shift_by_one: bool,
        base_log_n: int,
        device: "bool | None" = None,
    ):
        """Chain construction (reference: build_sect_ecfft_tree,
        src/ec_fft.rs:197-239).

        The isogeny chain is always built on the host (O(log n) point
        ops); the leaf/layer enumeration runs on-device for larger
        domains (batched affine ladder, fftree/device_build.py) and on
        the host for small ones.
        """
        if device is None:
            # host chain build is ~190us/point measured (25 s at 2^17,
            # ~7 min at 2^21) - the right tool through m=2^20.  The
            # device chunked ladder exists for 2^22+ (where host
            # enumeration is tens of minutes) but its first compile on
            # the tunneled backend is minutes-to-unbounded (the 28-step
            # masked ladder with per-step Montgomery-trick inversions
            # stalled >27 min at 2^19 on 2026-08-20), so it is opt-in
            # via threshold until the compile is tamed.
            device = domain_len >= _env_int("DVPARI_DEVICE_TREE_MIN", 1 << 22)
        if device:
            from dvpari_tpu.fftree.device_build import build_layers_device

            meta = aux_curve.build_chain_meta(domain_len, shift_by_one, base_log_n)
            layers = build_layers_device(meta, domain_len)
            x0s = [iso.x0 for _, iso in meta.layers if iso is not None]
            return cls(layers, x0s, shift_by_one, base_log_n)
        chain = aux_curve.build_chain(domain_len, shift_by_one, base_log_n)
        layers = [jnp.asarray(fr.from_int(layer.xs)) for layer in chain]
        x0s = [layer.isogeny.x0 for layer in chain if layer.isogeny is not None]
        return cls(layers, x0s, shift_by_one, base_log_n)

    # -- views --------------------------------------------------------------
    #
    # Table/view preparation NEVER runs eager device ops: on the tunneled
    # TPU backend every eager slice of a unique shape is a ~45 s remote
    # compile, and the per-level loops below issue hundreds of them
    # (measured r3: the 2^16 setup spent its first hour compiling
    # jit_gather/jit_dynamic_slice one-liners).  Layers are mirrored to
    # host numpy once; slicing is numpy; results upload once per view.

    def _layer_np(self, k: int) -> np.ndarray:
        if k not in self._np_cache:
            self._np_cache[k] = np.asarray(jax.device_get(self.layers[k]))
        return self._np_cache[k]

    def leaves(self, d: int = 0) -> jnp.ndarray:
        """Leaf x-coords of the depth-d subtree view (stride 2^d)."""
        key = ("leaves", d)
        if key not in self._dev_cache:
            self._dev_cache[key] = jnp.asarray(
                np.ascontiguousarray(self._layer_np(0)[:, :: 1 << d])
            )
        return self._dev_cache[key]

    def subtree_size_to_depth(self, size: int) -> int:
        d = _log2(self.n) - _log2(size)
        assert d >= 0
        return d

    def both_domains(self):
        """(D, D') leaf vectors (reference: get_both_domains,
        src/ec_fft.rs:179-189)."""
        key = ("both",)
        if key not in self._dev_cache:
            L0 = self._layer_np(0)
            self._dev_cache[key] = (
                jnp.asarray(np.ascontiguousarray(L0[:, 0::2])),
                jnp.asarray(np.ascontiguousarray(L0[:, 1::2])),
            )
        return self._dev_cache[key]

    # -- cached constants ---------------------------------------------------

    def _level_consts_fn(self, e: int):
        """Jitted builder of one level's decompose/recombine constants."""
        key = ("lvl", e)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def build(s0, s1, t0, t1, x0):
            v0e = fr.pow_const(fr.sub(s0, x0), e)
            v1e = fr.pow_const(fr.sub(s1, x0), e)
            det = fr.mul(fr.mul(v0e, v1e), fr.sub(s1, s0))
            det_inv = fr.batch_inverse(det, axis=0)
            d00 = fr.mul(fr.mul(s1, v1e), det_inv)
            d01 = fr.neg(fr.mul(fr.mul(s0, v0e), det_inv))
            d10 = fr.neg(fr.mul(v1e, det_inv))
            d11 = fr.mul(v0e, det_inv)
            w0e = fr.pow_const(fr.sub(t0, x0), e)
            w1e = fr.pow_const(fr.sub(t1, x0), e)
            return (
                (d00, d01, d10, d11),
                (w0e, fr.mul(t0, w0e), w1e, fr.mul(t1, w1e)),
            )

        self._jit_cache[key] = jax.jit(build)
        return self._jit_cache[key]

    def _extend_consts(self, d: int, moiety: str):
        """Device-resident decompose/recombine tables (fused-path form)."""
        key = (d, moiety)
        if key in self._ext_cache:
            return self._ext_cache[key]
        dec_np, rec_np = self._extend_consts_np(d, moiety)
        self._ext_cache[key] = (
            [tuple(jax.device_put(v) for v in t) for t in dec_np],
            [tuple(jax.device_put(v) for v in t) for t in rec_np],
        )
        return self._ext_cache[key]

    def _extend_consts_np(self, d: int, moiety: str):
        """Host (numpy) decompose/recombine tables; the base layer both
        the fused-path device cache and the chunked-path per-chunk cache
        draw from (and the form persisted next to the tree artifact)."""
        key = ("np", d, moiety)
        if key in self._ext_cache:
            return self._ext_cache[key]
        tname = f"ext_{d}_{moiety}"
        z = self._table_load(tname)
        if z is not None:
            K = int(z["K"])
            dec = [tuple(z[f"d{k}_{i}"] for i in range(4)) for k in range(K)]
            rec = [tuple(z[f"r{k}_{i}"] for i in range(4)) for k in range(K)]
            self._ext_cache[key] = (dec, rec)
            return self._ext_cache[key]
        m = self.n >> (d + 1)
        src_off = 0 if moiety == "S1" else (1 << d)
        tgt_off = (1 << d) if moiety == "S1" else 0
        stride = 1 << (d + 1)
        cpu = _cpu_device()
        K = _log2(m)
        host = {}

        def derive(k):
            mk = m >> k
            half = mk >> 1
            Lk = self._layer_np(k)
            s = Lk[:, src_off::stride]
            t = Lk[:, tgt_off::stride]
            args = tuple(
                np.ascontiguousarray(a)
                for a in (s[:, :half], s[:, half:mk], t[:, :half], t[:, half:mk])
            )
            x0 = np.broadcast_to(
                np.asarray(fr.from_int(self.x0s[k])).reshape(fr.NLIMB, 1),
                (fr.NLIMB, half),
            )
            # constants math runs on the LOCAL cpu backend (fast local
            # compile, one program per level size), then uploads once
            fn = self._level_consts_fn(half - 1)
            if cpu is not None:
                with jax.default_device(cpu):
                    dk, rk = fn(*args, x0)
            else:
                dk, rk = fn(*args, x0)
            return [np.asarray(v) for v in dk], [np.asarray(v) for v in rk]

        # levels are independent: overlap their local XLA:CPU compiles
        # (each level size is its own small program; a cold 2^16 prove
        # spent ~18 min deriving extend tables serially)
        nw = _warm_workers()
        if K > 1 and nw > 1:
            with ThreadPoolExecutor(max_workers=nw) as pool:
                derived = list(pool.map(derive, range(K)))
        else:
            derived = [derive(k) for k in range(K)]
        dec, rec = [], []
        for k, (dk, rk) in enumerate(derived):
            for i in range(4):
                host[f"d{k}_{i}"] = dk[i]
                host[f"r{k}_{i}"] = rk[i]
            dec.append(tuple(dk))
            rec.append(tuple(rk))
        p = self._table_path(tname)
        if p:
            np.savez(p, K=np.int64(_log2(m)), **host)
        self._ext_cache[key] = (dec, rec)
        return self._ext_cache[key]

    def _chunk_tables(self, d: int, moiety: str, C: int):
        """Chunked-path device tables for the extend at view d.

        dict with:
          big_dec / big_rec: per BIG level (span > C), 4 lists of C-chunk
            device tables for the two-chunk passes;
          ab_dec / ab_rec: per SMALL level (span <= C), the compact
            span-periodic flat-chain coefficient pairs
            A = [t0 | t3], B = [t1 | t2] (see chunked._bf).
        Cached per view."""
        key = ("chunktab", d, moiety, C)
        if key not in self._dev_cache:
            from dvpari_tpu.fftree import chunked

            dec_np, rec_np = self._extend_consts_np(d, moiety)
            K = len(dec_np)
            jb = max(0, K - _log2(C))  # levels with span > C
            put = lambda a: jax.device_put(jnp.asarray(np.ascontiguousarray(a)))
            ab = lambda t0, t3, t1, t2: (
                put(np.concatenate([t0, t3], axis=-1)),
                put(np.concatenate([t1, t2], axis=-1)),
            )
            self._dev_cache[key] = {
                "big_dec": [
                    tuple(chunked.chunk_table(v, C) for v in dec_np[j])
                    for j in range(jb)
                ],
                "big_rec": [
                    tuple(chunked.chunk_table(v, C) for v in rec_np[j])
                    for j in range(jb)
                ],
                # dec level j: U0 = d00 E0 + d01 E1; U1 = d10 E0 + d11 E1
                "ab_dec": [
                    ab(dec_np[j][0], dec_np[j][3], dec_np[j][1], dec_np[j][2])
                    for j in range(jb, K)
                ],
                # rec level j: P0 = r0 U0 + r0x U1; P1 = r1 U0 + r1x U1
                "ab_rec": [
                    ab(rec_np[j][0], rec_np[j][3], rec_np[j][1], rec_np[j][2])
                    for j in range(jb, K)
                ],
            }
        return self._dev_cache[key]

    def _xnn(self, d: int):
        """Device x^(view_size/2) on even / odd leaves of view(d)."""
        key = ("xnn_dev", d)
        if key not in self._dev_cache:
            ev, od = self._xnn_np(d)
            self._dev_cache[key] = (
                jax.device_put(jnp.asarray(ev)),
                jax.device_put(jnp.asarray(od)),
            )
        return self._dev_cache[key]

    def _xnn_np(self, d: int):
        """Host (numpy) x^(view_size/2) tables on the two moieties."""
        if d in self._xnn_cache:
            return self._xnn_cache[d]
        z = self._table_load(f"xnn_{d}")
        if z is not None:
            self._xnn_cache[d] = (z["even"], z["odd"])
            return self._xnn_cache[d]
        sz = self.n >> (d + 1)
        lv = np.ascontiguousarray(self._layer_np(0)[:, :: 1 << d])
        cpu = _cpu_device()
        fn = self._jitted(
            ("xnn_pow", sz, lv.shape), lambda v: fr.pow_const(v, sz)
        )
        if cpu is not None:
            with jax.default_device(cpu):
                vals = np.asarray(fn(lv))
        else:
            vals = np.asarray(fn(lv))
        ev = np.ascontiguousarray(vals[:, 0::2])
        od = np.ascontiguousarray(vals[:, 1::2])
        p = self._table_path(f"xnn_{d}")
        if p:
            np.savez(p, even=ev, odd=od)
        self._xnn_cache[d] = (ev, od)
        return self._xnn_cache[d]

    def _xnn_chunks(self, d: int, C: int):
        key = ("xnnchunk", d, C)
        if key not in self._dev_cache:
            from dvpari_tpu.fftree import chunked

            ev, od = self._xnn_np(d)
            self._dev_cache[key] = (
                chunked.chunk_table(ev, C),
                chunked.chunk_table(od, C),
            )
        return self._dev_cache[key]

    def z_coeffs(self, d: int) -> jnp.ndarray:
        """Vanishing-poly coefficients of view(d) leaves: (20, n_d + 1).

        A one-time domain precompute, cached as the z_poly artifact (the
        reference budgets 2h+ for it at 2^23, src/artifacts.rs:92).
        Small domains use the python-int product tree; large ones the
        GMP Kronecker-substitution tree (utils/kronecker.py) -- the
        device (XLA) Karatsuba tree exists (fftree/polyops.py) but its
        O(3^depth) live temporaries exhaust HBM past ~2^16 leaves, so
        the host owns this artifact at scale.
        """
        if d not in self._zc_cache:
            z = self._table_load(f"zc_{d}")
            if z is not None:
                self._zc_np_cache[d] = z["zc"]
                self._zc_cache[d] = jnp.asarray(z["zc"])
                return self._zc_cache[d]
            n_d = self.n >> d
            if n_d <= HOST_ZC_MAX:
                got = np.asarray(
                    fr.from_int(_host_vanishing_coeffs(fr.to_int(self.leaves(d))))
                )
            else:
                from dvpari_tpu.utils import kronecker

                got = kronecker.vanishing_coeffs_limbs(self.leaves(d))
                if got is None:  # no native zpoly: int-level ctypes tree
                    got = fr.from_int(
                        kronecker.vanishing_coeffs(fr.to_int(self.leaves(d)), fr.P)
                    )
                got = np.asarray(got)
            p = self._table_path(f"zc_{d}")
            if p:
                np.savez(p, zc=got)
            self._zc_np_cache[d] = got
            self._zc_cache[d] = jnp.asarray(got)
        return self._zc_cache[d]

    def _zc_np(self, d: int) -> np.ndarray:
        """Host copy of z_coeffs(d) (no eager device slices downstream)."""
        if d not in self._zc_np_cache:
            self.z_coeffs(d)
            if d not in self._zc_np_cache:  # pre-table in-memory hit
                self._zc_np_cache[d] = np.asarray(
                    jax.device_get(self._zc_cache[d])
                )
        return self._zc_np_cache[d]

    def _z0_inv_odd(self, d: int) -> jnp.ndarray:
        """1 / Z_{view(d+1)} evaluated at the odd leaves of view(d)."""
        if d in self._z0odd_cache:
            return self._z0odd_cache[d]
        z = self._table_load(f"z0inv_{d}")
        if z is not None:
            self._z0odd_cache[d] = jax.device_put(z["inv"])
            return self._z0odd_cache[d]
        n = self.n >> d
        zc = self._zc_np(d + 1)  # (20, n/2+1)
        padded = np.zeros((fr.NLIMB, n), dtype=np.int32)
        padded[:, : zc.shape[-1]] = zc
        ev = self.enter(jnp.asarray(padded), d)
        fn = self._jitted(
            ("z0invodd", ev.shape),
            lambda e: fr.batch_inverse(e[:, 1::2], axis=0),
        )
        out = fn(ev)
        p = self._table_path(f"z0inv_{d}")
        if p:
            np.savez(p, inv=np.asarray(jax.device_get(out)))
        self._z0odd_cache[d] = out
        return self._z0odd_cache[d]

    def vanish_coeffs_subset(self, indices, d: int = 0) -> jnp.ndarray:
        """Vanishing-poly coefficients (20, k + 1) of an ARBITRARY subset
        of view(d) leaves -- the ecfft crate's general `vanish`
        capability (DV-Pari itself only needs the moiety case,
        vanish_subdomain).  Any subset size; Kronecker product tree."""
        from dvpari_tpu.utils import kronecker

        dom = fr.to_int(self.leaves(d))
        pts = [dom[int(i)] for i in indices]
        assert len(pts) == len(set(pts)) and pts, "distinct, non-empty subset"
        return jnp.asarray(fr.from_int(kronecker.vanishing_coeffs(pts, fr.P)))

    def vanish_subdomain(self, d: int = 0) -> jnp.ndarray:
        """Evals of Z_{view(d+1)-leaves} on ALL view(d) leaves (zeros on the
        even moiety) - the reference's `vanish(S0)` use
        (reference: src/ec_fft.rs:241-282)."""
        n = self.n >> d
        zc = self._zc_np(d + 1)
        padded = np.zeros((fr.NLIMB, n), dtype=np.int32)
        padded[:, : zc.shape[-1]] = zc
        return self.enter(jnp.asarray(padded), d)

    # -- core transforms ----------------------------------------------------
    #
    # Public entry points are jit-compiled per (op, view, moiety, shape):
    # the per-level constants are closed over as compile-time constants and
    # the whole level-synchronous pass fuses into one XLA program.

    def _jitted(self, key, builder):
        # Module-level builders (the per-level transform bodies) share ONE
        # jit wrapper across all FFTree instances: jax.jit's signature
        # cache then makes tree2nd's levels hit the executables tree2n
        # already compiled (same shapes), instead of re-jitting -- on the
        # tunneled backend each re-jit is a ~50-100 s persistent-cache
        # load, x18 levels per tree.
        if (
            getattr(builder, "__module__", None) == __name__
            and getattr(builder, "__name__", "<lambda>") != "<lambda>"
        ):
            if builder not in _MOD_JITS:
                _MOD_JITS[builder] = jax.jit(builder)
            return _MOD_JITS[builder]
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(builder)
        return self._jit_cache[key]

    def _warm(self, jobs):
        """Overlap the XLA compiles of a batch of level programs.

        jobs: list of (key, thunk) where thunk() calls the jitted level
        function once with dummy (zeros) state and the real tables.  The
        dummy executions are microseconds of device time; the point is
        that each first call carries that program's compile, and running
        them from a thread pool overlaps the compile RPCs (minutes each
        on the tunneled backend).  The level loop that follows then hits
        the in-process executable cache."""
        todo = [
            (k, t)
            for k, t in jobs
            if k not in self._warmed and k not in _MOD_WARMED
        ]
        for k, _ in todo:
            self._warmed.add(k)
            _MOD_WARMED.add(k)
        nw = _warm_workers()
        if len(todo) <= 1 or nw <= 1:
            return
        import time as _time

        trace = os.environ.get("DVPARI_TRACE")
        t0 = _time.time()

        def run(job):
            key, thunk = job
            ts = _time.time()
            thunk()
            return key, _time.time() - ts

        with ThreadPoolExecutor(max_workers=nw) as pool:
            for key, dt in pool.map(run, todo):
                if trace:
                    print(f"  [warm {dt:7.1f}s] {key}", flush=True)
        if trace:
            print(
                f"  [warm total {_time.time()-t0:.1f}s, {len(todo)} programs, "
                f"{nw} workers]",
                flush=True,
            )

    def _use_chunked(self, x, n: int) -> bool:
        """Route unbatched transforms above one chunk through the
        size-independent pass engine (fftree/chunked.py); batched,
        sharded, or traced inputs keep the fused per-shape programs."""
        from dvpari_tpu.fftree import chunked

        if os.environ.get("DVPARI_PASS_IMPL", "chunked") != "chunked":
            return False
        if n <= chunked.chunk_elems():
            return False
        if getattr(x, "ndim", 0) != 2:
            return False
        if isinstance(x, jax.core.Tracer):
            return False
        if isinstance(x, np.ndarray):
            return True
        try:
            return len(x.devices()) == 1
        except Exception:
            return False

    def extend(self, evals: jnp.ndarray, moiety: str = "S1", d: int = 0):
        m = evals.shape[-1]
        assert m == self.n >> (d + 1), (m, self.n, d)
        if m == 1:
            return evals
        if self._use_chunked(evals, m):
            from dvpari_tpu.fftree import chunked

            return chunked.extend(self, evals, moiety, d)
        dec, rec = self._extend_consts(d, moiety)
        fn = self._jitted(("extend", d, evals.shape), _extend_tabled)
        return fn(evals, dec, rec)

    def enter(self, coeffs: jnp.ndarray, d: int = 0) -> jnp.ndarray:
        """Coefficients -> evals, one jitted program PER LEVEL.

        The single fused O(log^2 n)-pass program (each level embeds a
        full extend) grows to millions of HLO ops by 2^16 leaves and
        gets the remote TPU compiler OOM-killed; level-at-a-time the
        largest module is one extend, which compiles at every size the
        prover itself uses.  Extra cost: K-1 dispatch round trips on a
        setup-only path."""
        n = coeffs.shape[-1]
        assert n == self.n >> d
        if self._use_chunked(coeffs, n):
            from dvpari_tpu.fftree import chunked

            return chunked.enter(self, coeffs, d)
        K = _log2(n)
        # pass 1: derive tables (host + local-CPU), propagate level shapes
        # with eval_shape, and overlap the K remote compiles (see _warm)
        levels, jobs = [], []
        sds = jax.ShapeDtypeStruct(
            tuple(coeffs.shape) + (1,), coeffs.dtype
        )  # (20, *B, V=n, s=1)
        for k in reversed(range(K)):
            dec, rec = self._extend_consts(d + k, "S1")
            xe, xo = self._xnn(d + k)
            key = ("enter_lvl", d, k, coeffs.shape)
            fn = self._jitted(key, _enter_level)
            levels.append((fn, dec, rec, xe, xo))
            shp, dt = sds.shape, sds.dtype
            jobs.append(
                (key, lambda f=fn, s=shp, t=dt, a=(dec, rec, xe, xo): f(
                    jnp.zeros(s, t), *a
                ))
            )
            sds = jax.eval_shape(fn, sds, dec, rec, xe, xo)
        self._warm(jobs)
        # pass 2: the actual level-synchronous execution (all cache hits)
        state = coeffs[..., :, None]
        for fn, dec, rec, xe, xo in levels:
            state = fn(state, dec, rec, xe, xo)
        return state[..., 0, :]

    def exit(self, evals: jnp.ndarray, d: int = 0) -> jnp.ndarray:
        """Evals -> coefficients, level-at-a-time (same module-size
        rationale as enter)."""
        n = evals.shape[-1]
        assert n == self.n >> d
        K = _log2(n)
        # two-pass like enter: derive tables + overlap the 2K compiles
        fwd, bwd, jobs = [], [], []
        sds = jax.ShapeDtypeStruct(
            tuple(evals.shape[:-1]) + (1, evals.shape[-1]), evals.dtype
        )  # (20, *B, V=1, s=n)
        for k in range(K):
            ext1 = self._extend_consts(d + k, "S1")
            ext0 = self._extend_consts(d + k, "S0")
            z0inv = self._z0_inv_odd(d + k)
            key = ("exit_fwd", d, k, evals.shape)
            fn = self._jitted(key, _exit_fwd_level)
            fwd.append((fn, ext1, ext0, z0inv))
            shp, dt = sds.shape, sds.dtype
            jobs.append(
                (key, lambda f=fn, s=shp, t=dt, a=(ext1, ext0, z0inv): f(
                    jnp.zeros(s, t), *a
                ))
            )
            sds = jax.eval_shape(fn, sds, ext1, ext0, z0inv)
        for k in reversed(range(K)):
            ztail = self._z0_tail(d + k + 1)
            key = ("exit_bwd", d, k, evals.shape)
            fn = self._jitted(key, _exit_bwd_level)
            bwd.append((fn, ztail))
            shp, dt = sds.shape, sds.dtype
            jobs.append(
                (key, lambda f=fn, s=shp, t=dt, a=(ztail,): f(
                    jnp.zeros(s, t), *a
                ))
            )
            sds = jax.eval_shape(fn, sds, ztail)
        self._warm(jobs)
        state = evals[..., None, :]
        for fn, ext1, ext0, z0inv in fwd:
            state = fn(state, ext1, ext0, z0inv)
        for fn, ztail in bwd:
            state = fn(state, ztail)
        return state[..., 0, :]

    def _extend_impl(self, evals: jnp.ndarray, moiety: str, d: int):
        """Trace-inline extend (for embedding in caller-jitted steps)."""
        m = evals.shape[-1]
        assert m == self.n >> (d + 1), (m, self.n, d)
        if m == 1:
            return evals
        dec, rec = self._extend_consts(d, moiety)
        return _extend_tabled(evals, dec, rec)

    def _z0_tail(self, d: int) -> jnp.ndarray:
        """Z_{view(d)} minus its monic top term: (20, n_d) coefficients
        (host slice: an eager device slice is a remote compile on the
        tunneled backend)."""
        key = ("z0tail", d)
        if key not in self._dev_cache:
            self._dev_cache[key] = jnp.asarray(
                np.ascontiguousarray(self._zc_np(d)[..., :-1])
            )
        return self._dev_cache[key]


# -- tabled transform bodies (module-level: jitted with the per-level
#    constants passed as ARGUMENTS, never closed over) ----------------------
#
# Closing the tables into the trace would embed them in the lowered HLO
# as literal constants: O(m log m) bytes of module, which (a) breaks
# remote-compile transports at scale (the axon tunnel rejects >~100 MB
# modules) and (b) duplicates the tables per compiled shape.  As
# arguments they live once in HBM and the module stays O(log^2 m) ops.


def _extend_tabled(evals: jnp.ndarray, dec, rec) -> jnp.ndarray:
    """Levelwise ECFFT extend: evals of P (deg < m) on one moiety of a
    view -> the other moiety.  dec/rec: per-level 4-tuples of (20, half)
    coefficient vectors from FFTree._extend_consts (shared across the
    2^k subvectors at level k -- the stride-view collapse).
    (reference: FFTree::extend, used at src/proving.rs:410-422)
    """
    state = evals[..., None, :]  # (20, *B, V=1, s=m)
    for k in range(len(dec)):
        half = state.shape[-1] // 2
        d00, d01, d10, d11 = (_bcast(c, state.ndim) for c in dec[k])
        E0, E1 = state[..., :half], state[..., half:]
        U0 = fr.add(fr.mul(d00, E0), fr.mul(d01, E1))
        U1 = fr.add(fr.mul(d10, E0), fr.mul(d11, E1))
        st = jnp.stack([U0, U1], axis=-2)  # (..., V, 2, half)
        state = st.reshape(*st.shape[:-3], -1, half)
    for k in reversed(range(len(rec))):
        half = state.shape[-1]
        r0, r0x, r1, r1x = (_bcast(c, state.ndim) for c in rec[k])
        st = state.reshape(*state.shape[:-2], -1, 2, half)
        U0, U1 = st[..., 0, :], st[..., 1, :]
        P0 = fr.add(fr.mul(r0, U0), fr.mul(r0x, U1))
        P1 = fr.add(fr.mul(r1, U0), fr.mul(r1x, U1))
        state = jnp.concatenate([P0, P1], axis=-1)
    return state[..., 0, :]


def _enter_level(state, dec, rec, xe, xo):
    """One enter level (reference: FFTree::enter recursion step,
    src/ec_fft.rs:284-335): split odd/even coefficient subvectors,
    extend both, recombine with x^sz on each moiety."""
    u = state[..., 0::2, :]
    v = state[..., 1::2, :]
    u_ext = _extend_tabled(u, dec, rec)
    v_ext = _extend_tabled(v, dec, rec)
    xe = _bcast(xe, state.ndim)
    xo = _bcast(xo, state.ndim)
    even = fr.add(u, fr.mul(xe, v))
    odd = fr.add(u_ext, fr.mul(xo, v_ext))
    st = jnp.stack([even, odd], axis=-1)  # (..., V/2, sz, 2)
    return st.reshape(*st.shape[:-3], st.shape[-3], 2 * st.shape[-2])


def _exit_fwd_level(state, ext1, ext0, z0inv):
    """One forward exit level: P = A + Z0 * B decomposition (the role of
    the reference FFTree's z0_inv_s1 / z1_inv_s0 fields, src/srs.rs:92-99;
    FFTree::exit via compute_vanishing_polynomial, src/ec_fft.rs:241-282)."""
    y0 = state[..., 0::2]
    y1 = state[..., 1::2]
    a_odd = _extend_tabled(y0, *ext1)
    z0inv = _bcast(z0inv, state.ndim)
    b_odd = fr.mul(fr.sub(y1, a_odd), z0inv)
    b_even = _extend_tabled(b_odd, *ext0)
    st = jnp.stack([y0, b_even], axis=-2)  # (..., V, 2, s/2)
    return st.reshape(*st.shape[:-3], -1, st.shape[-1])


def _exit_bwd_level(state, ztail):
    """One backward exit level: coefficient recombination
    P = [A ‖ B] + Z0_tail * B (batched Karatsuba polymul)."""
    sz = state.shape[-1]
    st = state.reshape(*state.shape[:-2], -1, 2, sz)
    A, B = st[..., 0, :], st[..., 1, :]
    z0t = _bcast(ztail, st.ndim - 1)
    prod = polymul(z0t, B)  # (..., V, 2*sz - 1)
    out = jnp.concatenate([A, B], axis=-1)
    out = out.at[..., : 2 * sz - 1].set(fr.add(out[..., : 2 * sz - 1], prod))
    return out
