import time, random, numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/dvpari_jax_cache_tpu")
from dvpari_tpu.ops import xsk233
from dvpari_tpu.utils import xsk233_host as host
rng = random.Random(8)
msm = jax.jit(xsk233.msm)
for N in (1024,):
    ks = [rng.randrange(1, host.R) for _ in range(N)]
    bits = jnp.asarray(xsk233.scalars_to_bits(ks))
    pts = jnp.broadcast_to(xsk233.generator().reshape(3,8,1), (3,8,N))
    t0=time.perf_counter()
    lowered = msm.lower(bits, pts); compiled = lowered.compile()
    print(N, "compile:", f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter(); o = compiled(bits, pts); arr = np.asarray(o)
    print(N, "exec+fetch 1:", f"{time.perf_counter()-t0:.3f}s", flush=True)
    ks2 = [rng.randrange(1, host.R) for _ in range(N)]
    b2 = jnp.asarray(xsk233.scalars_to_bits(ks2))
    t0=time.perf_counter(); o = compiled(b2, pts); arr2 = np.asarray(o)
    print(N, "exec+fetch 2:", f"{time.perf_counter()-t0:.3f}s", flush=True)
    from dvpari_tpu.ops import gf2
    # quick correctness via host
    def aff(a):
        from dvpari_tpu.utils import gf2_host as gh
        X, Y, Z = [sum(int(a[c, i]) << (32*i) for i in range(8)) for c in range(3)]
        zi = gh.inv_int(Z)
        return (gh.mul_int(X, zi), gh.mul_int(Y, zi))
    print("correct:", aff(arr2) == host.smul(sum(ks2)%host.R, (host.GX, host.GY)), flush=True)
