import time, random
import jax, jax.numpy as jnp
import numpy as np
from dvpari_tpu.ops import xsk233
from dvpari_tpu.utils import xsk233_host as host
rng = random.Random(7)
msm = jax.jit(xsk233.msm)
for N in (4096, 16384, 65536):
    ks = [rng.randrange(1, host.R) for _ in range(N)]
    bits = jnp.asarray(xsk233.scalars_to_bits(ks))
    pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,N))
    o = msm(bits, pts); o.block_until_ready()  # compile
    ks2 = [rng.randrange(1, host.R) for _ in range(N)]
    b2 = jnp.asarray(xsk233.scalars_to_bits(ks2))
    t0=time.perf_counter(); o = msm(b2, pts); o.block_until_ready()
    dt = time.perf_counter()-t0
    print(N, f"{dt:.3f}s", f"{N/dt:,.0f} pts/s")
