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


def build_layers_device(meta: aux_curve.ChainMeta, domain_len: int):
    """Returns the list of per-layer x-coordinate arrays (int32[20, n_l])."""
    log_n = domain_len.bit_length() - 1
    # stacked generator-double table: (log_n, 2, 20) limbs
    gen_tab = np.stack(
        [
            np.stack([fr.from_int(g[0]), fr.from_int(g[1])], axis=0)
            for g in meta.gen_doubles
        ],
        axis=0,
    ) if log_n else np.zeros((0, 2, fr.NLIMB), np.int32)

    @jax.jit
    def layer0():
        X = fr.broadcast_scalar(fr.from_int(meta.coset[0]), (domain_len,))
        Y = fr.broadcast_scalar(fr.from_int(meta.coset[1]), (domain_len,))
        idx = jnp.arange(domain_len, dtype=jnp.int32)
        tab = jnp.asarray(gen_tab)

        def body(j, carry):
            X, Y = carry
            g = jax.lax.dynamic_index_in_dim(tab, j, keepdims=False)  # (2, 20)
            gx = jnp.broadcast_to(g[0][:, None], (fr.NLIMB, domain_len))
            gy = jnp.broadcast_to(g[1][:, None], (fr.NLIMB, domain_len))
            x3, y3 = _affine_add(X, Y, gx, gy)
            mask = ((idx >> j) & 1) == 1
            return fr.select(mask, x3, X), fr.select(mask, y3, Y)

        X, Y = jax.lax.fori_loop(0, log_n, body, (X, Y))
        return X

    layers = [layer0()]
    n = domain_len
    for curve, iso in meta.layers[:-1]:
        xs = layers[-1][:, : n // 2]

        def map_x(xs, iso=iso):
            x0 = fr.broadcast_scalar(fr.from_int(iso.x0), xs.shape[1:])
            t = fr.broadcast_scalar(fr.from_int(iso.t), xs.shape[1:])
            num = fr.add(fr.sub(fr.square(xs), fr.mul(x0, xs)), t)
            den_inv = fr.batch_inverse(fr.sub(xs, x0), axis=0)
            return fr.mul(num, den_inv)

        layers.append(jax.jit(map_x)(xs))
        n //= 2
    return layers
