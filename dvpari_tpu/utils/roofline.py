"""Analytic roofline models for the hot kernels + achieved-rate reporting.

BASELINE.json's north star asks for per-chip roofline analysis of every
GF(2^233) kernel: this module carries static op/byte cost models (lane-
ops = 32-bit VPU lane operations; bytes = HBM traffic assuming no
reuse), and turns measured wall times into achieved rates and
%-of-peak.  Peaks default to TPU v5e: ~3.9e12 int32 lane-ops/s
(8x128x4 VPU lanes @ ~0.94 GHz) and ~820 GB/s HBM.

Usage:
    est = msm_bitsliced_cost(n)
    rep = achieved(est, wall_seconds)
    print(format_row("msm_bs", est, rep))
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_LANE_OPS = 3.9e12  # int32 lane-ops/s peak (VPU)
V5E_HBM_BPS = 820e9

M = 233
WIDE = 465
N_WINDOWS = 62


@dataclass
class Cost:
    lane_ops: float  # 32-bit lane operations
    hbm_bytes: float  # minimal HBM traffic (inputs+outputs once)

    def __add__(self, o):
        return Cost(self.lane_ops + o.lane_ops, self.hbm_bytes + o.hbm_bytes)

    def scaled(self, k):
        return Cost(self.lane_ops * k, self.hbm_bytes * k)


def gf2bs_mul_cost(n_elems: int) -> Cost:
    """Bit-sliced GF(2^233) multiply (ops/gf2bs.py:mul): 240 aligned
    window passes of AND+XOR over (240, C) planes + 8 phase shifts +
    trinomial fold; n_elems = 32 * C lanes' worth of elements."""
    C = max(n_elems // 32, 1)
    passes = 240 * 2 * 240 * C  # AND+XOR over the 240-row window
    shifts = 8 * 2 * 472 * C
    fold = 6 * M * C
    return Cost(passes + shifts + fold, 0.0)


def gf2bs_square_cost(n_elems: int) -> Cost:
    C = max(n_elems // 32, 1)
    return Cost((2 * WIDE + 6 * M) * C, 0.0)


def bs_add_cost(n_elems: int) -> Cost:
    """Masked-complete bit-sliced group add: 24 muls + 7 squares +
    predicates/selects."""
    mul24 = gf2bs_mul_cost(n_elems).scaled(24)
    sqr = gf2bs_square_cost(n_elems).scaled(7)
    masks = Cost(20 * M * max(n_elems // 32, 1), 0.0)
    return mul24 + sqr + masks


def msm_bitsliced_cost(n_points: int) -> Cost:
    """Full tau-NAF bit-sliced MSM: table build (~6 adds + 3 frob) +
    62 x (frob^4 + pick + complete add) + fold (~log2(n) adds)."""
    step = (
        bs_add_cost(n_points)
        + gf2bs_square_cost(n_points).scaled(12)  # frobenius^4 x 3 coords
        + Cost(11 * 2 * 3 * M * max(n_points // 32, 1), 0.0)  # table pick
    )
    table = bs_add_cost(n_points).scaled(6) + gf2bs_square_cost(n_points).scaled(9)
    fold = bs_add_cost(n_points)  # geometric series ~ one full-width add
    io = Cost(0.0, n_points * (3 * M / 8 + 62 * 12 / 8))  # planes + masks
    return step.scaled(N_WINDOWS) + table + fold + io


def msm_wordsliced_cost(n_points: int) -> Cost:
    """Word-sliced ladder (ops/xsk233.py): per step ~24 word muls
    (~2.5k lane-ops each at 8 words) + table gather."""
    per_mul = 32 * 8 * 9 * 2 + 6 * 16  # clmul passes + fold, per element
    step = (24 * per_mul + 7 * 120 + 500) * n_points
    return Cost(step * N_WINDOWS, n_points * 3 * 8 * 4 * 2)


def extend_cost(m: int) -> Cost:
    """ECFFT extend on (20, m) limb vectors: log2(m) levels x ~4 fr.mul;
    fr.mul ~ 20x20 conv = 400 madds + fold ~ 1.2k lane-ops/elem."""
    import math

    levels = max(int(math.log2(max(m, 2))), 1)
    return Cost(levels * 4 * 1200 * m, m * 20 * 4 * 2 * levels)


@dataclass
class Achieved:
    seconds: float
    lane_ops_per_s: float
    pct_vpu_peak: float
    hbm_bps: float
    pct_hbm_peak: float


def achieved(cost: Cost, seconds: float) -> Achieved:
    s = max(seconds, 1e-9)
    return Achieved(
        seconds=seconds,
        lane_ops_per_s=cost.lane_ops / s,
        pct_vpu_peak=100.0 * cost.lane_ops / s / V5E_LANE_OPS,
        hbm_bps=cost.hbm_bytes / s,
        pct_hbm_peak=100.0 * cost.hbm_bytes / s / V5E_HBM_BPS,
    )


def format_row(name: str, cost: Cost, rep: Achieved) -> str:
    return (
        f"{name:<16} {rep.seconds:8.3f}s  "
        f"{cost.lane_ops / 1e9:9.2f} Gops  "
        f"{rep.lane_ops_per_s / 1e9:9.1f} Gops/s  "
        f"{rep.pct_vpu_peak:6.2f}% VPU  "
        f"{rep.pct_hbm_peak:6.2f}% HBM"
    )
