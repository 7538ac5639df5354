"""Sharded execution on the virtual 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from dvpari_tpu.ops import xsk233
from dvpari_tpu.parallel.mesh import make_mesh
from dvpari_tpu.parallel.sharded import msm_sharded
from dvpari_tpu.utils import xsk233_host as host


def test_msm_sharded_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    rng = random.Random(3)
    n = 16
    ks = [rng.randrange(1, host.R) for _ in range(n)]
    bits = jnp.asarray(xsk233.scalars_to_bits(ks))
    pts = jnp.broadcast_to(xsk233.generator().reshape(3, 8, 1), (3, 8, n))
    out = msm_sharded(bits, pts, mesh)
    want = host.smul(sum(ks) % host.R, (host.GX, host.GY))
    assert xsk233.to_affine_int(out) == want


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    res = jax.jit(fn)(*args)
    assert res.shape[:2] == (3, 8)
    g.dryrun_multichip(8)
