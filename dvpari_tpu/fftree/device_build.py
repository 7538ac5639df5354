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


def _affine_add(X, Y, gx, gy):
    """(X, Y) batch + broadcast point (gx, gy), affine SW addition."""
    dx_inv = fr.batch_inverse(fr.sub(gx, X), axis=0)
    lam = fr.mul(fr.sub(gy, Y), dx_inv)
    x3 = fr.sub(fr.sub(fr.square(lam), X), gx)
    y3 = fr.sub(fr.mul(lam, fr.sub(X, x3)), Y)
    return x3, y3


def _iso_map(xs, x0, t):
    """One isogeny x-map: (x^2 - x0*x + t) / (x - x0), batched."""
    x0b = jnp.broadcast_to(x0[:, None], xs.shape)
    tb = jnp.broadcast_to(t[:, None], xs.shape)
    num = fr.add(fr.sub(fr.square(xs), fr.mul(x0b, xs)), tb)
    den_inv = fr.batch_inverse(fr.sub(xs, x0b), axis=0)
    return fr.mul(num, den_inv)


_layer0_jits: dict = {}
_iso_jit = None


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def build_layers_device(meta: aux_curve.ChainMeta, domain_len: int):
    """Returns the list of per-layer x-coordinate arrays (int32[20, n_l])."""
    global _iso_jit
    log_n = domain_len.bit_length() - 1
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

    if domain_len not in _layer0_jits:

        @jax.jit
        def layer0(tab, cos):
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
            return X

        _layer0_jits[domain_len] = layer0

    layers = [_layer0_jits[domain_len](jnp.asarray(gen_tab), jnp.asarray(coset))]

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
