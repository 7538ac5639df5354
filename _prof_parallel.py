import os, time
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms","cpu")
import random
t0=time.time()
from dvpari_tpu.ops import xsk233
from dvpari_tpu.parallel.mesh import make_mesh
from dvpari_tpu.parallel.sharded import msm_sharded
from dvpari_tpu.utils import xsk233_host as host
print("imports", time.time()-t0, flush=True)
mesh = make_mesh(8)
rng = random.Random(3)
n = 16
ks = [rng.randrange(1, host.R) for _ in range(n)]
bits = jnp.asarray(xsk233.scalars_to_bits(ks))
pts = jnp.broadcast_to(xsk233.generator().reshape(3, 8, 1), (3, 8, n))
t0=time.time()
out = msm_sharded(bits, pts, mesh)
out.block_until_ready()
print("msm_sharded compile+run", time.time()-t0, flush=True)
t0=time.time()
out = msm_sharded(bits, pts, mesh); out.block_until_ready()
print("msm_sharded run", time.time()-t0, flush=True)
