"""Settle the Pippenger question with measurements (VERDICT r2 item 5).

The JOURNAL's round-2 analysis rejected bucket MSM on a paper traffic
model.  This script replaces the model with device measurements at
n = 2^20 on the real TPU:

  T_ladder   - the fused bit-sliced ladder (production MSM compute,
               recode excluded: both designs consume the same digits)
  T_tile     - one 32x32 bit-tile transpose pass network (5 shift-mask
               passes over the full plane array) -- the repack cost a
               bucket layout pays to move points at bit granularity
  T_gather   - one full-column gather by an arbitrary permutation
               (bucket grouping per window)
  T_fold     - one full pairwise column fold (C-1 complete adds) -- the
               per-window segmented bucket accumulation cost, identical
               add-count to one ladder window pass

A width-8 tau-adic bucket design does per window: repack (2 tile
networks + 1 gather) + segmented fold; with 31 windows instead of the
ladder's 62 the projected time is

  T_pip ~ 31 * (2*T_tile + T_gather + T_fold) + combine
  T_lad ~ 62 * T_fold                         (the ladder IS 62 folds)

plus identical recode/upload costs on both sides.  Whichever wins,
the decision becomes a measured fact.

Run from /root/repo:  python scripts/pippenger_ab.py [log2_n]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

if os.environ.get("DVPARI_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DVPARI_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "DVPARI_JAX_CACHE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache", "tpu",
        ),
    ),
)

import numpy as np
import jax.numpy as jnp

from dvpari_tpu.ops import fr, xsk233
from dvpari_tpu.ops import xsk233_bs as bs
from dvpari_tpu.ops import pallas_msm
from dvpari_tpu.ops.tnaf import recode_masks_bulk
from dvpari_tpu.utils import xsk233_host as host


def timeit(fn, reps=3):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn()))  # honest fence on axon
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log_n
    C = n // 32
    print("devices:", jax.devices(), f"n = 2^{log_n} (C = {C} columns)", flush=True)

    rng = np.random.default_rng(5)
    # synthetic operands: G replicated (costs are data-independent)
    g_planes = bs.pack_points(
        np.asarray(
            jax.device_get(
                jnp.broadcast_to(xsk233.generator().reshape(3, 8, 1), (3, 8, 32))
            )
        )
    )
    planes = jnp.asarray(np.broadcast_to(g_planes, (3, bs.M, C)).copy())
    ks = [int.from_bytes(rng.bytes(29), "little") % host.R for _ in range(4096)]
    canon = np.asarray(fr.from_int(ks * (n // 4096)))
    oh, ng = recode_masks_bulk(canon)
    oh_d, ng_d = jnp.asarray(oh), jnp.asarray(ng)

    # --- T_ladder: production fused MSM compute (Pallas engine) ---------
    # chunked exactly like the production path (ops/xsk233.py:
    # _msm_limbs_bitsliced, 512-column chunks): one whole-array
    # msm_packed call does NOT compile at C=2^15 -- the XLA table-build
    # fusion exceeds the 16 MB scoped-VMEM limit (measured here first).
    ck = int(os.environ.get("DVPARI_MSM_CHUNK_COLS", "512"))

    def ladder_all():
        parts = [
            pallas_msm.msm_packed(
                oh_d[..., c0 : c0 + ck], ng_d[..., c0 : c0 + ck],
                planes[..., c0 : c0 + ck],
            )
            for c0 in range(0, C, ck)
        ]
        return bs.fold_cols(jnp.stack(parts, axis=-1))

    t_ladder = timeit(ladder_all, reps=3)
    print(f"T_ladder (62-window fused MSM, {ck}-col chunks): {t_ladder:.3f}s "
          f"({n / t_ladder:,.0f} pts/s compute-only)", flush=True)

    # --- T_fold: pairwise column fold cost (~C complete adds) -----------
    # measured as one half-width add (C/2 columns) and doubled: the fold
    # level widths sum to ~C, and the narrow latency-bound tail is
    # shared by both designs.  (A single whole-array fold jit risks the
    # same scoped-VMEM fusion blowup as the unchunked table build.)
    half_add = jax.jit(
        lambda p: bs.add(p[..., : C // 2], p[..., C // 2 :])
    )
    t_half = timeit(lambda: half_add(planes), reps=3)
    t_fold = 2 * t_half
    print(f"T_fold (~C adds = 1 window of bucket accumulation): "
          f"{t_fold:.3f}s (= 2 x {t_half:.3f}s half-width add)", flush=True)

    # --- T_tile: 32x32 bit-tile transpose network (5 shift-mask passes) -
    M1 = jnp.uint32(0x55555555)
    M2 = jnp.uint32(0x33333333)
    M4 = jnp.uint32(0x0F0F0F0F)
    M8 = jnp.uint32(0x00FF00FF)
    M16 = jnp.uint32(0x0000FFFF)

    @jax.jit
    def tile_net(p):
        # 32x32 bit-transpose butterfly over 32-column blocks: each pass
        # pairs partner columns (lane-axis roll) and swaps bit halves.
        # Op mix per pass -- one lane shuffle, two shifts, two masks, one
        # combine over the full array -- matches the real repack, which
        # is what is being timed.
        v = p.reshape(*p.shape[:-1], p.shape[-1] // 32, 32)
        for m, s in ((M1, 1), (M2, 2), (M4, 4), (M8, 8), (M16, 16)):
            q = jnp.roll(v, s, axis=-1)
            v = (v & ~m) | ((q >> s) & m)
        return v.reshape(p.shape)

    t_tile = timeit(lambda: tile_net(planes), reps=3)
    print(f"T_tile (5-pass 32x32 bit-transpose network): {t_tile:.3f}s",
          flush=True)

    # --- T_gather: full column gather by arbitrary permutation ----------
    perm = jnp.asarray(rng.permutation(C).astype(np.int32))
    gather = jax.jit(lambda p, ix: jnp.take(p, ix, axis=-1))
    t_gather = timeit(lambda: gather(planes, perm), reps=3)
    print(f"T_gather (arbitrary column permutation): {t_gather:.3f}s",
          flush=True)

    # --- verdict --------------------------------------------------------
    n_win_pip = 31  # width-8 tau-adic windows
    t_pip = n_win_pip * (2 * t_tile + t_gather + t_fold)
    t_lad_model = 62 * t_fold
    print("---", flush=True)
    print(f"ladder measured:              {t_ladder:.3f}s", flush=True)
    print(f"ladder modeled (62*T_fold):   {t_lad_model:.3f}s "
          f"(model sanity: {t_lad_model / t_ladder:.2f}x of measured)",
          flush=True)
    print(f"bucket projected (31 windows): {t_pip:.3f}s  = 31*(2*{t_tile:.3f}"
          f" + {t_gather:.3f} + {t_fold:.3f})", flush=True)
    ratio = t_pip / t_ladder
    verdict = "LADDER WINS" if ratio >= 1.0 else "BUCKET WINS"
    print(f"A/B: bucket/ladder = {ratio:.2f}x -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
