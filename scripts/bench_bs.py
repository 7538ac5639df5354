"""TPU A/B bench: word-sliced vs bit-sliced tau-NAF MSM.

Run from /root/repo (no PYTHONPATH).  Times the device MSM only (recode
excluded on both sides to isolate kernel throughput) and then the honest
end-to-end (recode included) number for the bit-sliced path.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvpari_tpu.ops import fr, tnaf, xsk233, xsk233_bs as bs, pallas_msm


def fence(x):
    return np.asarray(jax.device_get(x))


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(42)
    sizes = [int(s) for s in (sys.argv[1:] or ["4096", "16384", "65536"])]
    for n in sizes:
        ks = [int.from_bytes(rng.bytes(28), "little") % (1 << 225) for _ in range(n)]
        idx_np, sgn_np = tnaf.recode_scalars_bulk(np.asarray(fr.from_int(ks)))

        # points: random multiples of G -- build with the word ladder once
        seeds = [int.from_bytes(rng.bytes(8), "little") for _ in range(n)]
        pts = xsk233.scalar_mul_gen_ints(seeds)
        pts_np = np.asarray(jax.device_get(pts))

        import os

        skip_word = os.environ.get("BS_SKIP_WORD", "") == "1"
        # --- word-sliced path ---
        idx, sgn = jnp.asarray(idx_np), jnp.asarray(sgn_np)
        reps = 3
        if skip_word:
            compile_ws, ws, r_ws = 0.0, float("inf"), None
        else:
            t0 = time.time()
            r_ws = fence(xsk233.msm_frob_jit(idx, sgn, pts))
            compile_ws = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                r_ws = fence(xsk233.msm_frob_jit(idx, sgn, pts))
            ws = (time.time() - t0) / reps

        # --- bit-sliced path ---
        oh_np, ng_np = bs.digit_masks(idx_np, sgn_np)
        pbs_np = bs.pack_points(pts_np)
        oh, ng, pbs = jnp.asarray(oh_np), jnp.asarray(ng_np), jnp.asarray(pbs_np)
        t0 = time.time()
        r_bs = fence(bs.msm_packed(oh, ng, pbs))
        compile_bs = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            r_bs = fence(bs.msm_packed(oh, ng, pbs))
        bst = (time.time() - t0) / reps

        # --- pallas fused ladder ---
        import os
        c_tile = int(os.environ.get("BS_C_TILE", str(pallas_msm.C_TILE)))
        t0 = time.time()
        r_pl = fence(pallas_msm.msm_packed(oh, ng, pbs, c_tile=c_tile))
        compile_pl = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            r_pl = fence(pallas_msm.msm_packed(oh, ng, pbs, c_tile=c_tile))
        plt = (time.time() - t0) / reps

        # honest end-to-end for pallas: recode + masks + pack + device
        limbs = np.asarray(fr.from_int(ks))
        t0 = time.time()
        idx2, sgn2 = tnaf.recode_scalars_bulk(limbs)
        oh2, ng2 = bs.digit_masks(idx2, sgn2)
        pbs2 = bs.pack_points(pts_np)
        fence(pallas_msm.msm_packed(
            jnp.asarray(oh2), jnp.asarray(ng2), jnp.asarray(pbs2), c_tile=c_tile
        ))
        e2e = time.time() - t0

        # cross-check results
        p_bs = xsk233.to_affine_int(jnp.asarray(bs.extract_point(r_bs, 0)))
        p_pl = xsk233.to_affine_int(jnp.asarray(bs.extract_point(r_pl, 0)))
        ok = p_bs == p_pl and (
            skip_word or xsk233.to_affine_int(r_ws) == p_bs
        )
        print(
            f"n={n}: word {n/ws:9.0f} pts/s (compile {compile_ws:5.1f}s) | "
            f"bitsliced {n/bst:9.0f} pts/s (compile {compile_bs:5.1f}s) | "
            f"pallas {n/plt:9.0f} pts/s (compile {compile_pl:5.1f}s) | "
            f"pl e2e {n/e2e:9.0f} pts/s | match={ok}",
            flush=True,
        )
        assert ok, "MISMATCH between word-sliced and bit-sliced MSM!"


if __name__ == "__main__":
    main()
