import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, random, numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "DVPARI_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", "tpu")))
from dvpari_tpu.ops import xsk233
from dvpari_tpu.utils import xsk233_host as host
rng = random.Random(8)
N = 1024
pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,N))
msmf = jax.jit(xsk233.msm_frob)
ks = [rng.randrange(1, host.R) for _ in range(N)]
t0=time.perf_counter(); idx, sgn = xsk233.recode_ints(ks); print("recode:", f"{time.perf_counter()-t0:.2f}s", flush=True)
t0=time.perf_counter(); o = np.asarray(msmf(idx, sgn, pts)); print("compile+first:", f"{time.perf_counter()-t0:.1f}s", flush=True)
ks2 = [rng.randrange(1, host.R) for _ in range(N)]
i2, s2 = xsk233.recode_ints(ks2)
t0=time.perf_counter(); o = np.asarray(msmf(i2, s2, pts)); dt=time.perf_counter()-t0
print("exec:", f"{dt:.3f}s", f"{N/dt:,.0f} pts/s", flush=True)
def aff(a):
    from dvpari_tpu.utils import gf2_host as gh
    X, Y, Z = [sum(int(a[c, i]) << (32*i) for i in range(8)) for c in range(3)]
    zi = gh.inv_int(Z); return (gh.mul_int(X, zi), gh.mul_int(Y, zi))
print("correct:", aff(o) == host.smul(sum(ks2)%host.R, (host.GX, host.GY)))
