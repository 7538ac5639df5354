import time, random, numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/dvpari_jax_cache_tpu")
from dvpari_tpu.ops import xsk233
import dvpari_tpu.ops.pallas_ladder as pld
from dvpari_tpu.utils import xsk233_host as host
rng = random.Random(29)
N = 2048
ks = [rng.randrange(1, host.R) for _ in range(N)]
idx, sgn = xsk233.recode_ints(ks)
pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,N))
t0=time.perf_counter()
out = np.asarray(pld.msm_frob_pallas(idx, sgn, pts))
print("pallas compile+first:", f"{time.perf_counter()-t0:.1f}s", flush=True)
def aff(a):
    from dvpari_tpu.utils import gf2_host as gh
    X, Y, Z = [sum(int(a[c, i]) << (32*i) for i in range(8)) for c in range(3)]
    zi = gh.inv_int(Z); return (gh.mul_int(X, zi), gh.mul_int(Y, zi))
want = host.smul(sum(ks)%host.R, (host.GX, host.GY))
print("correct:", aff(out) == want, flush=True)
ks2 = [rng.randrange(1, host.R) for _ in range(N)]
i2, s2 = xsk233.recode_ints(ks2)
t0=time.perf_counter(); o2 = np.asarray(pld.msm_frob_pallas(i2, s2, pts)); dt = time.perf_counter()-t0
print(f"pallas exec: {dt:.3f}s  {N/dt:,.0f} pts/s", flush=True)
print("correct2:", aff(o2) == host.smul(sum(ks2)%host.R, (host.GX, host.GY)), flush=True)
