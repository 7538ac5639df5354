import time, random
import jax, jax.numpy as jnp
from dvpari_tpu.ops import xsk233
from dvpari_tpu.utils import xsk233_host as host

rng = random.Random(7)
N = 256
ks = [rng.randrange(1, host.R) for _ in range(N)]
bits = jnp.asarray(xsk233.scalars_to_bits(ks))
points = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,N))
msm = jax.jit(xsk233.msm)
out = msm(bits, points); out.block_until_ready()
# correctness: sum of k_i mod r applied to G
total = sum(ks) % host.R
want = host.smul(total, (host.GX, host.GY))
got = xsk233.to_affine_int(out)
print("correct:", got == want)
# timing single calls with fresh scalars
for trial in range(3):
    ks2 = [rng.randrange(1, host.R) for _ in range(N)]
    b2 = jnp.asarray(xsk233.scalars_to_bits(ks2))
    t0 = time.perf_counter(); o = msm(b2, points); o.block_until_ready()
    print("msm(256) fresh:", time.perf_counter()-t0)
