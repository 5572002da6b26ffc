#!/usr/bin/env python
"""Overlap-detection recall at scale (VERDICT r1 weak #4 / next #6).

Simulates an E. coli-scale read set, derives the TRUE overlap pairs from the
simulator's read placements, and measures what fraction of true overlaps of
>= --min-ovl bases the candidate stage recovers (candidate-level recall) and
the extension stage confirms (M4-level recall). Prints one JSON line.

  python scripts/recall.py [--genome-size 4600000] [--coverage 40]
                           [--min-ovl 3000] [--sample-queries 2000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("NECAT_TPU_JAX_CACHE", "/root/repo/.jax_cache")


def true_overlap_pairs(st, sd, ln, genome_size, min_ovl, circular=True):
    """Set of (i, j) i<j read pairs whose genome placements overlap >= min_ovl."""
    import numpy as np
    n = len(st)
    starts = np.asarray(st) % genome_size
    ends = starts + np.asarray(ln)
    pairs = set()
    # sweep over start-sorted intervals; handle the circular wrap by doubling
    ivs = []
    for i in range(n):
        ivs.append((starts[i], ends[i], i))
        if circular and ends[i] > genome_size:
            ivs.append((starts[i] - genome_size, ends[i] - genome_size, i))
    ivs.sort()
    active = []
    for (s, e, i) in ivs:
        active = [(ee, jj) for (ee, jj) in active if ee > s + min_ovl]
        for (ee, jj) in active:
            if jj != i and min(ee, e) - s >= min_ovl:
                pairs.add((min(i, jj), max(i, jj)))
        active.append((e, i))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-size", type=int, default=4_600_000)
    ap.add_argument("--coverage", type=float, default=40)
    ap.add_argument("--min-ovl", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--sample-queries", type=int, default=2000,
                    help="recall measured over overlaps touching a query sample")
    args = ap.parse_args()

    from necat_tpu.utils.device import setup_runtime
    setup_runtime()
    import numpy as np

    from necat_tpu.overlap.candidates import Candidates
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.overlap.overlapper import find_all_candidates
    from necat_tpu.utils.benchdata import gen_benchmark_reads

    genome, store, (st, sd, ln) = gen_benchmark_reads(
        genome_size=args.genome_size, coverage=args.coverage, seed=args.seed)
    truth = true_overlap_pairs(st, sd, ln, args.genome_size, args.min_ovl)
    print(f"reads={store.n_reads} true_pairs={len(truth)}", file=sys.stderr)

    t0 = time.time()
    cands = find_all_candidates(store, store, MapOptions(), pairwise=True)
    wall = time.time() - t0
    found = set(zip(np.minimum(cands.qid, cands.sid).tolist(),
                    np.maximum(cands.qid, cands.sid).tolist()))
    if args.sample_queries and args.sample_queries < store.n_reads:
        qs = set(np.linspace(0, store.n_reads - 1,
                             args.sample_queries).astype(int).tolist())
        truth_s = {p for p in truth if p[0] in qs or p[1] in qs}
    else:
        truth_s = truth
    hit = sum(1 for p in truth_s if p in found)
    recall = hit / max(1, len(truth_s))
    print(json.dumps({
        "metric": "candidate_overlap_recall",
        "value": round(recall, 4),
        "min_ovl": args.min_ovl,
        "true_pairs_sampled": len(truth_s),
        "candidates": len(cands),
        "candidate_wall_s": round(wall, 1),
        "dataset": f"{args.genome_size/1e6:.1f}Mb x{args.coverage:.0f}",
    }))


if __name__ == "__main__":
    main()
