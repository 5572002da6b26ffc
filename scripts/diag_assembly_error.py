#!/usr/bin/env python
"""Diagnostic: where does the assembly stage ADD error? (VERDICT r5 #2b)

Contigs measure ~0.8 pp below the corrected reads they are spliced from
(PARITY: 98.57 vs 99.41), while the reference adds only 0.04 pp. Feed
assemble() reads at a KNOWN high identity, align the emitted contig back to
the truth, and histogram the error positions relative to the contig's tile
joints — if errors cluster at joints, the splice (trim_u handling, branch
merge, circular trim) is the culprit; if uniform, the tile segments
themselves are degraded.

Usage: python scripts/diag_assembly_error.py [genome_kb] [err_pct]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NECAT_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
from necat_tpu.utils.device import setup_runtime  # noqa: E402

setup_runtime()

import numpy as np  # noqa: E402

from necat_tpu.assembly.contigs import assemble  # noqa: E402
from necat_tpu.io import simulate  # noqa: E402
from necat_tpu.io.readstore import ReadStore  # noqa: E402
from necat_tpu.overlap.options import MapOptions  # noqa: E402
from necat_tpu.overlap.overlapper import overlap_all_vs_all  # noqa: E402


def main():
    gkb = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    err = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    G = gkb * 1000
    genome = simulate.random_genome(G, seed=31)
    em = simulate.ErrorModel(err / 300, err / 300, err / 300)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=30, mean_len=15000, min_len=5000, max_len=30000,
        em=em, seed=32, circular=False)
    store = ReadStore.from_seqs(reads)
    print(f"genome {G} reads {store.n_reads} input err ~{err:.2f}%", flush=True)

    mopts = MapOptions(ncan=100, scan_window=10, n_chains_per_pair=2)
    m4 = overlap_all_vs_all(store, mopts)
    res = assemble(store, m4)
    ctg = res.contigs
    print(f"contigs: {ctg.n_reads}, total {int(ctg.lengths.sum())}", flush=True)

    from necat_tpu.consensus.linkdp import host_edit_ops
    from necat_tpu.align.banded import OP_DIAG, OP_DEL

    for ci in range(min(ctg.n_reads, 3)):
        c = ctg.get(ci)
        tiles = res.tiles[ci]
        joints = np.array(sorted({t.ctg_start for t in tiles}
                                 | {t.ctg_end for t in tiles}))
        # align contig to genome in 50 kb windows (both strands; keep best)
        best_err = []
        W = 50000
        for ws in range(0, len(c), W):
            seg = c[ws:ws + W]
            if len(seg) < 5000:
                continue
            cand = []
            for flip in (False, True):
                s2 = (3 - seg[::-1]).astype(np.uint8) if flip else seg
                # locate roughly on genome via one 1k anchor probe
                probe = s2[len(s2) // 2:len(s2) // 2 + 1000]
                ops, qs, qe = host_edit_ops(probe, genome)
                # too slow globally; instead map via overlapper
                cand.append(None)
            best_err.append(None)
        # simpler: per-position error profile via whole-contig windowed map
        from necat_tpu.overlap.overlapper import map_reads_to_reference
        wsz = 20000
        segs = [c[s:s + wsz] for s in range(0, max(len(c) - 5000, 1), wsz)]
        qs_store = ReadStore.from_seqs(segs)
        m = map_reads_to_reference(
            qs_store, ReadStore.from_seqs([genome]),
            MapOptions(scan_window=5, ncan=4, block_score_cutoff=2),
            min_align_size=2000, band_width=512)
        perseg = {}
        for i in range(len(m)):
            q = int(m.qid[i])
            nc = int(m.qend[i] - m.qoff[i])
            if q not in perseg or perseg[q][1] < nc:
                perseg[q] = (float(m.ident[i]), nc)
        idents = np.array([perseg[q][0] for q in sorted(perseg)])
        segpos = np.array([q * wsz for q in sorted(perseg)])
        w = np.array([perseg[q][1] for q in sorted(perseg)], np.float64)
        print(f"ctg{ci}: windows mapped {len(idents)}/{len(segs)} "
              f"identity {np.average(idents, weights=w):.3f}% "
              f"min {idents.min():.2f} @ {segpos[np.argmin(idents)]}")
        nj = [int(((joints >= p) & (joints < p + wsz)).sum()) for p in segpos]
        # correlation: windows with many joints vs few
        lo = idents[np.array(nj) <= np.median(nj)]
        hi = idents[np.array(nj) > np.median(nj)]
        if len(lo) and len(hi):
            print(f"  joints<=med: {lo.mean():.3f}%  joints>med: {hi.mean():.3f}%"
                  f"  (med {np.median(nj)} joints/window)")
        worst = np.argsort(idents)[:5]
        for wi in worst:
            print(f"  worst window @ {segpos[wi]}: {idents[wi]:.2f}% "
                  f"({nj[wi]} joints)")


if __name__ == "__main__":
    main()
