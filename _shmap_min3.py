import os, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms","cpu")
import numpy as np, random
from dvpari_tpu.ops import xsk233
from dvpari_tpu.parallel.mesh import make_mesh
from dvpari_tpu.parallel.sharded import msm_sharded, msm_frob_sharded
from dvpari_tpu.utils import xsk233_host as host
mesh = make_mesh(8)
rng = random.Random(3)
n = 16
ks = [rng.randrange(1, host.R) for _ in range(n)]
bits = jnp.asarray(xsk233.scalars_to_bits(ks))
pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,n))
t0=time.time(); o = msm_sharded(bits, pts, mesh); o.block_until_ready()
print("msm_sharded compile+run:", time.time()-t0, flush=True)
want = host.smul(sum(ks)%host.R, (host.GX, host.GY))
print("correct:", xsk233.to_affine_int(o) == want, flush=True)
idx, sgn = xsk233.recode_ints(ks)
t0=time.time(); o2 = msm_frob_sharded(idx, sgn, pts, mesh); o2.block_until_ready()
print("msm_frob_sharded compile+run:", time.time()-t0, flush=True)
print("correct2:", xsk233.to_affine_int(o2) == want, flush=True)
