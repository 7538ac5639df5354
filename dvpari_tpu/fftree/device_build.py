"""Device-side FFTree layer construction (batched over Fr lanes).

The reference enumerates tree leaves with a rayon-parallel EC point
ladder on the host (reference: src/ec_fft.rs:157-162).  At 2^20+ leaves
a host loop is minutes of python; here layer 0 is built on-device with
log2(N) batched affine additions of doubled generators (selected by the
index bits).

Exceptional cases cannot occur: partial sums live in the coset
C + <G> while the added points live in <G>, and the coset is chosen
disjoint (reference: src/ec_fft.rs:222-228) - so x1 != x2 always and
plain affine formulas are safe.

Split of labor (r3, measured on the tunneled TPU backend):
 * layer 0 (the O(n)-lane ladder, all the FLOPs) is ONE jitted TPU
   program with the generator table and coset as arguments;
 * the higher layers (isogeny x-maps over geometrically shrinking
   widths, total work ~n lanes) run on the LOCAL CPU backend, one
   argument-passing jit per shape.  Remote per-layer compiles cost
   minutes EACH (a 45-minute tree-build hang at 2^19), and fusing all
   layers into the layer-0 program got the remote compiler SIGKILLed
   after 938 s at the same size; local compiles are seconds.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree import aux_curve


def _jacobian_madd(X, Y, Z, gx, gy):
    """Jacobian accumulator (X, Y, Z) + affine point (gx, gy), mixed
    addition (madd-2007-bl, 7M+4S, no inversion).  Complete here: the
    accumulator lives in the coset C + <G>, the added point in <G>, and
    the coset is chosen disjoint (reference: src/ec_fft.rs:222-228), so
    H = 0 (equal x) and Z = 0 (infinity) cannot occur.  Keeping the
    ladder inversion-free is what makes the program compile: the earlier
    affine variant ran a Montgomery-trick batch inversion (two
    width-2^16 associative scans + a Fermat chain) inside EVERY masked
    step, and its 28-step loop stalled the tunneled remote compiler
    >27 min at 2^19 lanes (2026-08-20)."""
    z1z1 = fr.square(Z)
    u2 = fr.mul(gx, z1z1)
    s2 = fr.mul(gy, fr.mul(Z, z1z1))
    h = fr.sub(u2, X)
    hh = fr.square(h)
    i4 = fr.add(fr.add(hh, hh), fr.add(hh, hh))
    j = fr.mul(h, i4)
    r = fr.add(fr.sub(s2, Y), fr.sub(s2, Y))
    v = fr.mul(X, i4)
    x3 = fr.sub(fr.sub(fr.square(r), j), fr.add(v, v))
    yj = fr.mul(Y, j)
    y3 = fr.sub(fr.mul(r, fr.sub(v, x3)), fr.add(yj, yj))
    z3 = fr.sub(fr.sub(fr.square(fr.add(Z, h)), z1z1), hh)
    return x3, y3, z3


def _iso_map(xs, x0, t):
    """One isogeny x-map: (x^2 - x0*x + t) / (x - x0), batched."""
    x0b = jnp.broadcast_to(x0[:, None], xs.shape)
    tb = jnp.broadcast_to(t[:, None], xs.shape)
    num = fr.add(fr.sub(fr.square(xs), fr.mul(x0b, xs)), tb)
    den_inv = fr.batch_inverse(fr.sub(xs, x0b), axis=0)
    return fr.mul(num, den_inv)


_layer0_jits: dict = {}
_layer0_chunk_jit = None
_iso_jit = None

# Fixed ladder-table length for the size-independent chunked program:
# steps j >= log2(n) have index bit 0 for every lane (idx < n), so their
# adds are masked no-ops and a table padded past log_n changes nothing.
_LADDER_STEPS = aux_curve.SUBGROUP_ADICITY


def _layer0_chunk_width() -> int:
    import os

    return int(os.environ.get("DVPARI_LAYER0_CHUNK", str(1 << 16)))


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _make_layer0(width: int, log_n: int, chunked: bool):
    """Ladder program over `width` lanes.  chunked=True takes the lane
    offset as an ARGUMENT and always runs _LADDER_STEPS masked steps, so
    ONE compiled program serves every chunk of every domain size -- the
    per-size monolithic variant hung the tunneled remote compiler for
    45+ min at 2^19 lanes (JOURNAL r3/r4), exactly like the MSM's
    per-offset eager slices before chunk offsets became arguments."""
    steps = _LADDER_STEPS if chunked else log_n

    @jax.jit
    def layer0(tab, cos, offset):
        X = jnp.broadcast_to(cos[0][:, None], (fr.NLIMB, width))
        Y = jnp.broadcast_to(cos[1][:, None], (fr.NLIMB, width))
        Z = fr.ones((width,))
        idx = offset + jnp.arange(width, dtype=jnp.int32)

        def body(j, carry):
            X, Y, Z = carry
            g = jax.lax.dynamic_index_in_dim(tab, j, keepdims=False)
            gx = jnp.broadcast_to(g[0][:, None], (fr.NLIMB, width))
            gy = jnp.broadcast_to(g[1][:, None], (fr.NLIMB, width))
            x3, y3, z3 = _jacobian_madd(X, Y, Z, gx, gy)
            mask = ((idx >> j) & 1) == 1
            return (
                fr.select(mask, x3, X),
                fr.select(mask, y3, Y),
                fr.select(mask, z3, Z),
            )

        X, _, Z = jax.lax.fori_loop(0, steps, body, (X, Y, Z))
        # one shared batch inversion at the END (not per step): x = X/Z^2
        zinv = fr.batch_inverse(Z, axis=0)
        return fr.mul(X, fr.square(zinv))

    return layer0


def build_layers_device(meta: aux_curve.ChainMeta, domain_len: int):
    """Returns the list of per-layer x-coordinate arrays (int32[20, n_l])."""
    global _iso_jit, _layer0_chunk_jit
    log_n = domain_len.bit_length() - 1
    ck = _layer0_chunk_width()
    chunked = domain_len > ck
    # stacked generator-double table, padded to the fixed program length
    # on the chunked path (pad entries are masked off for every lane)
    doubles = list(meta.gen_doubles)
    if chunked:
        doubles += [doubles[0]] * (_LADDER_STEPS - len(doubles))
    gen_tab = np.stack(
        [
            np.stack([fr.from_int(g[0]), fr.from_int(g[1])], axis=0)
            for g in doubles
        ],
        axis=0,
    ) if doubles else np.zeros((0, 2, fr.NLIMB), np.int32)
    coset = np.stack(
        [fr.from_int(meta.coset[0]), fr.from_int(meta.coset[1])], axis=0
    )

    tab_dev, cos_dev = jnp.asarray(gen_tab), jnp.asarray(coset)
    if chunked:
        if _layer0_chunk_jit is None:
            _layer0_chunk_jit = _make_layer0(ck, log_n, True)
        parts = [
            _layer0_chunk_jit(tab_dev, cos_dev, jnp.int32(off))
            for off in range(0, domain_len, ck)
        ]
        layers = [jnp.concatenate(parts, axis=1)]
    else:
        if domain_len not in _layer0_jits:
            _layer0_jits[domain_len] = _make_layer0(domain_len, log_n, False)
        layers = [_layer0_jits[domain_len](tab_dev, cos_dev, jnp.int32(0))]

    if _iso_jit is None:
        _iso_jit = jax.jit(_iso_map)
    cpu = _cpu_device()
    top_np = np.asarray(jax.device_get(layers[0]))  # one D2H, setup-only
    n = domain_len
    for _, iso in meta.layers[:-1]:
        xs = np.ascontiguousarray(top_np[:, : n // 2])
        x0 = fr.from_int(iso.x0)
        t = fr.from_int(iso.t)
        if cpu is not None:
            with jax.default_device(cpu):
                top_np = np.asarray(_iso_jit(xs, x0, t))
        else:
            top_np = np.asarray(jax.device_get(_iso_jit(xs, x0, t)))
        layers.append(jnp.asarray(top_np))
        n //= 2
    return layers
