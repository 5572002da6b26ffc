#!/usr/bin/env python
"""Diagnostic: per-iteration corrected-read identity on the bench dataset.

Replays the run_correct recipe (2 iterations: sensitive then fast options) on
the synthetic bench reads and, after each iteration, maps every emitted piece
back to the true genome to report:
  - identity of corrected pieces vs genome (weighted by aligned bases)
  - identity of raw-passthrough pieces
  - fraction of output bases that are corrected vs raw
This localizes the 99.41-vs-99.8 corrected-read parity gap (VERDICT r5 #2)
across iterations and piece classes.

Usage: python scripts/diag_iterations.py [genome_kb] [coverage]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NECAT_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
from necat_tpu.utils.device import setup_runtime  # noqa: E402

setup_runtime()

import numpy as np  # noqa: E402

from necat_tpu.consensus.correct import correct_reads  # noqa: E402
from necat_tpu.consensus.options import CnsOptions  # noqa: E402
from necat_tpu.io.readstore import ReadStore  # noqa: E402
from necat_tpu.overlap.candidates import Candidates  # noqa: E402
from necat_tpu.overlap.options import MapOptions  # noqa: E402
from necat_tpu.overlap.overlapper import find_all_candidates  # noqa: E402
from necat_tpu.utils.benchdata import gen_benchmark_reads  # noqa: E402


def piece_identity(seqs, genome):
    """Map each piece to the genome (both strands) with the host DP; return
    (ident %, aligned cols) per piece. Uses minimap-style anchoring via the
    overlapper for speed at scale."""
    from necat_tpu.overlap.overlapper import map_reads_to_reference
    qs = ReadStore.from_seqs(seqs)
    ref = ReadStore.from_seqs([genome])
    m4 = map_reads_to_reference(
        qs, ref, MapOptions(scan_window=5, ncan=4, block_score_cutoff=2),
        min_align_size=300, band_width=256)
    best = {}
    for i in range(len(m4)):
        q = int(m4.qid[i])
        nc = int(m4.qend[i] - m4.qoff[i])
        if q not in best or best[q][1] < nc:
            best[q] = (float(m4.ident[i]), nc)
    return best


def main():
    gkb = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 20
    genome, store, _ = gen_benchmark_reads(genome_size=gkb * 1000,
                                           coverage=cov, seed=7)
    cur = store
    for it in range(2):
        if it == 0:
            mopts = MapOptions.from_string("-n 500 -z 10 -e 0.5 -j 0 -u 1 -a 1000")
            copts = CnsOptions.from_string(
                "-a 2000 -x 4 -y 12 -l 1000 -e 0.5 -p 0.8 -u 0 -r 0")
        else:
            mopts = MapOptions.from_string("-n 500 -z 20 -b 2000 -e 0.5 -j 0 -u 1 -a 1000")
            copts = CnsOptions.from_string(
                "-a 2000 -x 4 -y 12 -l 1000 -e 0.5 -p 0.8 -u 0 -r 1")
        copts = dataclasses.replace(copts, full_consensus=(it + 1 != 2))
        t0 = time.time()
        cands = find_all_candidates(cur, cur, mopts, pairwise=True)
        call = Candidates.concat([cands, cands.swap_roles()])
        recs = correct_reads(cur, call, copts)
        recs.sort(key=lambda r: (r.tid, r.left))
        wall = time.time() - t0

        corr = [r for r in recs if r.corrected]
        raw = [r for r in recs if not r.corrected]
        cb = sum(len(r.seq) for r in corr)
        rb = sum(len(r.seq) for r in raw)
        print(f"\n== iteration {it + 1}: {len(recs)} pieces "
              f"({len(corr)} corrected {cb} b, {len(raw)} raw {rb} b) "
              f"wall {wall:.0f}s", flush=True)
        for label, group in (("corrected", corr), ("raw", raw)):
            if not group:
                continue
            sample = group if len(group) <= 400 else \
                [group[i] for i in np.linspace(0, len(group) - 1, 400,
                                               dtype=int)]
            idents = piece_identity([r.seq for r in sample], genome)
            if idents:
                w = np.array([idents[i][1] for i in idents], np.float64)
                v = np.array([idents[i][0] for i in idents], np.float64)
                print(f"  {label}: mapped {len(idents)}/{len(sample)}  "
                      f"identity {np.average(v, weights=w):.3f}%  "
                      f"(p10 {np.percentile(v, 10):.2f}  "
                      f"median {np.median(v):.2f})", flush=True)
        seqs = [r.seq for r in recs]
        names = [f"{r.tid}_{r.left}_{r.right}_{r.org_size}" for r in recs]
        cur = ReadStore.from_seqs(seqs, names)


if __name__ == "__main__":
    main()
