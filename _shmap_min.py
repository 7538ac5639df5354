import os, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms","cpu")
import numpy as np
from functools import partial
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
mesh = Mesh(np.array(jax.devices()), ("x",))

# 1. trivial scan inside shard_map
@partial(shard_map, mesh=mesh, in_specs=P(None, "x"), out_specs=P(None, "x"), check_rep=False)
def f1(a):
    def body(i, acc):
        return acc * 2 + 1
    return jax.lax.fori_loop(0, 232, body, a)
x = jnp.ones((4, 16), jnp.int32)
t0=time.time(); f1(x).block_until_ready(); print("trivial scan shmap:", time.time()-t0, flush=True)

# 2. gf2 mul ladder-ish inside shard_map
from dvpari_tpu.ops import gf2
@partial(shard_map, mesh=mesh, in_specs=P(None, "x"), out_specs=P(None, "x"), check_rep=False)
def f2(a):
    def body(i, acc):
        return gf2.mul(acc, a)
    return jax.lax.fori_loop(0, 232, body, a)
g = jnp.ones((8, 16), jnp.uint32)
t0=time.time(); f2(g).block_until_ready(); print("gf2 ladder shmap:", time.time()-t0, flush=True)

# 3. plain jit same body single device
@jax.jit
def f3(a):
    def body(i, acc):
        return gf2.mul(acc, a)
    return jax.lax.fori_loop(0, 232, body, a)
t0=time.time(); f3(g).block_until_ready(); print("gf2 ladder jit:", time.time()-t0, flush=True)
