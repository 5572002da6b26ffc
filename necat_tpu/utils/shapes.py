"""Static shape tiers.

Every device computation pads its arrays to one of a few fixed tiers so the
whole pipeline compiles only a handful of XLA programs (compiles are expensive,
especially through a remote-attached TPU). Queries and target windows share a
tier, so the extension kernel has exactly one shape per tier.
"""

from __future__ import annotations

# sequence-length tiers (reads 3 kb - 40 kb + polish windows). POWER-OF-TWO
# spacing on purpose: on the tunnel-attached TPU, LOADING a compiled
# executable into the device costs seconds (measured 5-10 s each, per
# process, even on persistent-cache hits) — with the earlier ~1.25x tier
# ladder the correction stage juggled 40-60 executable variants and spent
# ~10x more wall on program loads than on execution. Fewer, coarser tiers
# trade ≤2x padded cells (linear cost, ~100 ms/chunk) for ~10 executables
# total. All tiers are multiples of 2048 so every kernel block size divides
# them.
LENGTH_TIERS = (2048, 4096, 8192, 16384, 32768, 40960, 65536, 131072, 262144)

# dirs-buffer budget for the banded aligner: PB * L * W bytes (uint8 dirs +
# uint8 sub-matrix each this size; 16 GB HBM on v5e leaves ample headroom, and
# bigger chunks let the Pallas kernel run at its widest pair batch).
# 2 GB (round 4): every chunk carries ~30-40 ms of fixed launch+overhead cost
# through the tunnel (measured, scripts/microbench_ext.py) — doubling chunk
# capacity halves the chunk count of a correction pass at ~4-5 GB peak HBM
EXTENSION_BYTES = 2 << 30
BAND_W_DEFAULT = 128
# absolute band ceiling for the rescue ladder: W=8192 kernels overflow the
# 16 MB scoped VMEM (backtrack blocks) and the diagonalizer's sliding-window
# input count grows ~W/CBLK; 4096 covers ~1 kb of clustered indels
MAX_BAND = 4096


def length_tier(x: int) -> int:
    for t in LENGTH_TIERS:
        if x <= t:
            return t
    # beyond the largest tier: next power of two (rare; polish segments cap this)
    t = LENGTH_TIERS[-1]
    while t < x:
        t *= 2
    return t


def tier_below(L: int) -> int:
    """The next tier below L (L itself for the smallest tier)."""
    i = LENGTH_TIERS.index(L) if L in LENGTH_TIERS else None
    if i is None or i == 0:
        return L if i == 0 else L // 2
    return LENGTH_TIERS[i - 1]


def pairs_per_chunk(L: int, W: int = BAND_W_DEFAULT, cap: int = 1024) -> int:
    """Pair-batch bound for one extension chunk at tier L, floored to a power
    of two: the Pallas kernels require PB % 8 == 0 (a stray size like 204
    silently fell back to the lax.scan formulation, whose 40k-column scan +
    80k-step traceback ran minutes per chunk on TPU), and pow2 sizes keep the
    compiled-shape set small."""
    raw = max(8, min(cap, EXTENSION_BYTES // (L * W)))
    p = 8
    while p * 2 <= raw:
        p *= 2
    return p
