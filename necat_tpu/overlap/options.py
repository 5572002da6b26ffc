"""Mapping / candidate-detection options.

Defaults mirror the reference getopt defaults (src/common/map_options.c:12-46):
pairwise-mapping {k=15, scan_window=10, occ_cutoff=500, block_score_cutoff=3,
ncan=500, align_size_cutoff=500}; reference-mapping {scan_window=5, ncan=20};
assembly overlapper caps candidates at 100 (src/asm_pm/asm_pm_common.c:26).
Chain-DP constants from src/word_finder/chain_dp.c:161-181.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MapOptions:
    kmer_size: int = 15
    scan_window: int = 10
    occ_cutoff: int = 500
    block_score_cutoff: int = 3     # chain min seed count (min_cnt)
    ncan: int = 500                 # max candidates kept per query
    align_size_cutoff: int = 500    # min candidate span
    # chain-DP (chain_dp.c:161-181)
    chain_max_dist: int = 5000
    chain_bw: int = 500
    chain_min_score: int = 30
    # batching caps (TPU static shapes)
    max_hits: int = 1 << 21         # hit slots per (batch, strand) pass
    max_pairs: int = 8192           # (query, subject) pairs chained per pass
    max_seeds_per_pair: int = 64    # seeds fed to chain DP per pair (subsampled beyond)


CORRECTION_MAP_OPTIONS = MapOptions()
ASSEMBLY_MAP_OPTIONS = MapOptions(ncan=100, scan_window=10)
REFMAP_OPTIONS = MapOptions(scan_window=5, ncan=20, block_score_cutoff=2)
