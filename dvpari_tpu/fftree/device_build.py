"""Device-side FFTree layer construction (batched over Fr lanes).

The reference enumerates tree leaves with a rayon-parallel EC point
ladder on the host (reference: src/ec_fft.rs:157-162).  At 2^20+ leaves
a host loop is minutes of python; here layer 0 is built on-device with
log2(N) batched affine additions of doubled generators (selected by the
index bits), and each higher layer is one batched isogeny x-map.

Exceptional cases cannot occur: partial sums live in the coset
C + <G> while the added points live in <G>, and the coset is chosen
disjoint (reference: src/ec_fft.rs:222-228) - so x1 != x2 always and
plain affine formulas are safe.

The WHOLE build is one jitted program with every isogeny constant
passed as an argument: per-layer eager slices / per-layer jits with
embedded constants would cost one remote compile EACH on the tunneled
TPU backend (~45 s x 19 layers at 2^19 -- measured as a 45-minute
zpoly-stage hang, r3) and would never hit the persistent cache across
domain sizes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr
from dvpari_tpu.fftree import aux_curve


def _affine_add(X, Y, gx, gy):
    """(X, Y) batch + broadcast point (gx, gy), affine SW addition."""
    dx_inv = fr.batch_inverse(fr.sub(gx, X), axis=0)
    lam = fr.mul(fr.sub(gy, Y), dx_inv)
    x3 = fr.sub(fr.sub(fr.square(lam), X), gx)
    y3 = fr.sub(fr.mul(lam, fr.sub(X, x3)), Y)
    return x3, y3


_build_jits: dict = {}


def build_layers_device(meta: aux_curve.ChainMeta, domain_len: int):
    """Returns the list of per-layer x-coordinate arrays (int32[20, n_l])."""
    log_n = domain_len.bit_length() - 1
    n_iso = len(meta.layers) - 1
    # stacked generator-double table: (log_n, 2, 20) limbs
    gen_tab = np.stack(
        [
            np.stack([fr.from_int(g[0]), fr.from_int(g[1])], axis=0)
            for g in meta.gen_doubles
        ],
        axis=0,
    ) if log_n else np.zeros((0, 2, fr.NLIMB), np.int32)
    coset = np.stack(
        [fr.from_int(meta.coset[0]), fr.from_int(meta.coset[1])], axis=0
    )
    iso_x0 = (
        np.stack([fr.from_int(iso.x0) for _, iso in meta.layers[:-1]], axis=0)
        if n_iso
        else np.zeros((0, fr.NLIMB), np.int32)
    )
    iso_t = (
        np.stack([fr.from_int(iso.t) for _, iso in meta.layers[:-1]], axis=0)
        if n_iso
        else np.zeros((0, fr.NLIMB), np.int32)
    )

    key = (domain_len, log_n, n_iso)
    if key not in _build_jits:

        @jax.jit
        def all_layers(tab, cos, x0s, ts):
            X = jnp.broadcast_to(cos[0][:, None], (fr.NLIMB, domain_len))
            Y = jnp.broadcast_to(cos[1][:, None], (fr.NLIMB, domain_len))
            idx = jnp.arange(domain_len, dtype=jnp.int32)

            def body(j, carry):
                X, Y = carry
                g = jax.lax.dynamic_index_in_dim(tab, j, keepdims=False)
                gx = jnp.broadcast_to(g[0][:, None], (fr.NLIMB, domain_len))
                gy = jnp.broadcast_to(g[1][:, None], (fr.NLIMB, domain_len))
                x3, y3 = _affine_add(X, Y, gx, gy)
                mask = ((idx >> j) & 1) == 1
                return fr.select(mask, x3, X), fr.select(mask, y3, Y)

            X, _ = jax.lax.fori_loop(0, log_n, body, (X, Y))
            outs = [X]
            n = domain_len
            for i in range(n_iso):
                xs = outs[-1][:, : n // 2]
                x0 = jnp.broadcast_to(x0s[i][:, None], (fr.NLIMB, n // 2))
                t = jnp.broadcast_to(ts[i][:, None], (fr.NLIMB, n // 2))
                num = fr.add(fr.sub(fr.square(xs), fr.mul(x0, xs)), t)
                den_inv = fr.batch_inverse(fr.sub(xs, x0), axis=0)
                outs.append(fr.mul(num, den_inv))
                n //= 2
            return outs

        _build_jits[key] = all_layers

    return list(
        _build_jits[key](
            jnp.asarray(gen_tab),
            jnp.asarray(coset),
            jnp.asarray(iso_x0),
            jnp.asarray(iso_t),
        )
    )
