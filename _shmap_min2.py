import os, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms","cpu")
import numpy as np, random
from functools import partial
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
from dvpari_tpu.ops import xsk233
from dvpari_tpu.utils import xsk233_host as host
mesh = Mesh(np.array(jax.devices()), ("x",))
rng = random.Random(3)
n = 16
bits = jnp.asarray(xsk233.scalars_to_bits([rng.randrange(1, host.R) for _ in range(n)]))
pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,n))

t0=time.time()
o = jax.jit(xsk233.scalar_mul)(bits, pts); o.block_until_ready()
print("jit scalar_mul:", time.time()-t0, flush=True)

t0=time.time()
o = jax.jit(xsk233.msm)(bits, pts); o.block_until_ready()
print("jit msm:", time.time()-t0, flush=True)

@partial(shard_map, mesh=mesh, in_specs=(P(None,"x"), P(None,None,"x")), out_specs=P(None,None,"x"), check_rep=False)
def sm_shard(b, p):
    return xsk233.scalar_mul(b, p)
t0=time.time()
o = sm_shard(bits, pts); o.block_until_ready()
print("shmap scalar_mul:", time.time()-t0, flush=True)

@partial(shard_map, mesh=mesh, in_specs=(P(None,"x"), P(None,None,"x")), out_specs=P(), check_rep=False)
def msm_shard(b, p):
    local = xsk233.msm(b, p)
    g = jax.lax.all_gather(local, "x")
    return xsk233.reduce_sum(jnp.moveaxis(g, 0, -1))
t0=time.time()
o = msm_shard(bits, pts); o.block_until_ready()
print("shmap msm:", time.time()-t0, flush=True)
