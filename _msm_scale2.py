import time, random
import jax, jax.numpy as jnp
from dvpari_tpu.ops import xsk233
from dvpari_tpu.utils import xsk233_host as host
rng = random.Random(8)
msm = jax.jit(xsk233.msm)
N = 4096
ks = [rng.randrange(1, host.R) for _ in range(N)]
bits = jnp.asarray(xsk233.scalars_to_bits(ks))
pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,N))
t0=time.perf_counter(); o = msm(bits, pts); got = xsk233.to_affine_int(o)
print("first call + fetch:", time.perf_counter()-t0)
want = host.smul(sum(ks) % host.R, (host.GX, host.GY))
print("correct:", got == want)
ks2 = [rng.randrange(1, host.R) for _ in range(N)]
b2 = jnp.asarray(xsk233.scalars_to_bits(ks2))
t0=time.perf_counter(); o2 = msm(b2, pts); got2 = xsk233.to_affine_int(o2)
print("second call + fetch:", time.perf_counter()-t0)
print("correct2:", got2 == host.smul(sum(ks2) % host.R, (host.GX, host.GY)))
