"""Path-graph passes: bubbles, spurs, repeat bridges, branch selection.

Covers the reference's PathGraph (fsa path_graph.cpp): FindBundle/
ConstructCompoundPaths (:408-654), IdentifyPathSpur (:174-231),
RemoveDuplicateSimplePath (:235-281), MarkRepeatBridge (:656-705),
IdentifyPaths no|best (:707-870) — via synthetic genomes with engineered
heterozygous bubbles, and unit graphs.
"""

import numpy as np
import pytest

from necat_tpu.assembly.contigs import assemble
from necat_tpu.assembly.overlap_filter import FilterOptions
from necat_tpu.assembly.path_graph import (PathGraph, best_chain_through,
                                           sequence_similarity)
from necat_tpu.assembly.string_graph import StringGraph, vertex
from necat_tpu.io.readstore import ReadStore
from necat_tpu.io.simulate import simulate_reads


def _chain_graph(n_reads, read_len=1000, ovl=500):
    """String graph that is a single forward chain r0->r1->...->rn-1."""
    g = StringGraph(np.full(n_reads, read_len, np.int64))
    for i in range(n_reads - 1):
        u, v = vertex(i, 0), vertex(i + 1, 0)
        g.add_arc(u, v, read_len - ovl, ovl, 0.99, ovl, read_len)
        g.add_arc(v ^ 1, u ^ 1, read_len - ovl, ovl, 0.99, ovl, read_len)
    return g


def _add_arc_sym(g, i, oi, j, oj, length=500, score=500):
    u, v = vertex(i, oi), vertex(j, oj)
    g.add_arc(u, v, length, score, 0.99, 1000 - length, 1000)
    g.add_arc(v ^ 1, u ^ 1, length, score, 0.99, 1000 - length, 1000)


def test_simple_chain_single_path():
    g = _chain_graph(6)
    pg = PathGraph.from_string_graph(g)
    paths = pg.run_passes()
    assert len(paths) == 1
    total_arcs = sum(e.n_arcs for e in paths[0])
    assert total_arcs == 5


def test_bubble_becomes_compound_edge():
    # 0 -> {1a, 1b} -> 2 diamond plus entry/exit tails
    g = StringGraph(np.full(8, 1000, np.int64))
    _add_arc_sym(g, 0, 0, 1, 0)
    _add_arc_sym(g, 1, 0, 2, 0)   # branch a
    _add_arc_sym(g, 1, 0, 3, 0)   # branch b
    _add_arc_sym(g, 2, 0, 4, 0)
    _add_arc_sym(g, 3, 0, 4, 0)
    _add_arc_sym(g, 4, 0, 5, 0)
    pg = PathGraph.from_string_graph(g)
    pg.construct_compound_paths()
    kinds = [e.kind for e in pg.edges.values() if e.reduced is None]
    assert "compound" in kinds
    paths = pg.identify_paths("no")
    # the whole diamond collapses into one traversable path
    assert any(any(e.kind == "compound" for e in p) for p in paths)


def test_best_chain_through_picks_higher_score():
    g = StringGraph(np.full(8, 1000, np.int64))
    _add_arc_sym(g, 1, 0, 2, 0, score=900)   # strong branch
    _add_arc_sym(g, 2, 0, 4, 0, score=900)
    _add_arc_sym(g, 1, 0, 3, 0, score=100)   # weak branch
    _add_arc_sym(g, 3, 0, 4, 0, score=100)
    pg = PathGraph.from_string_graph(g)
    bundle = [e for e in pg.edges.values()
              if e.reduced is None and e.u // 2 in (1, 2, 3)]
    fwd = [e for e in bundle if e.u % 2 == 0 and e.v % 2 == 0]
    primary, alts = best_chain_through(fwd, vertex(1, 0), vertex(4, 0))
    reads_in_primary = {a.v // 2 for e in primary for a in e.arcs}
    assert 2 in reads_in_primary and 3 not in reads_in_primary
    assert len(alts) == 1


def test_spur_removal_cuts_short_dead_branch():
    g = _chain_graph(8)
    # short spur off read 3 to a dead-end read 20... use separate id space
    g2 = StringGraph(np.full(30, 1000, np.int64))
    for (u, v), a in g.arcs.items():
        g2.add_arc(a.u, a.v, a.length, a.score, a.identity, a.seg_start, a.seg_end)
    _add_arc_sym(g2, 3, 0, 20, 0, length=200, score=200)
    pg = PathGraph.from_string_graph(g2)
    paths = pg.run_passes(max_spur_length=50000)
    # the spur edge must not survive into any path
    for p in paths:
        for e in p:
            for a in (e.arcs if e.kind == "simple" else
                      [a for se in e.subedges for a in se.arcs]):
                assert a.v // 2 != 20


def test_duplicate_simple_path_removed():
    g = StringGraph(np.full(4, 1000, np.int64))
    _add_arc_sym(g, 0, 0, 1, 0, score=500)
    pg = PathGraph.from_string_graph(g)
    # inject a duplicate parallel simple path with the same endpoints
    dup = [a for a in g.arcs.values()][0]
    pg.add_simple_path([dup])
    pg.remove_duplicate_simple_path()
    active = [e for e in pg.edges.values()
              if e.reduced is None and e.u == vertex(0, 0)]
    assert len(active) == 1


def test_sequence_similarity_identical_and_mutated():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 3000).astype(np.uint8)
    cov, ident = sequence_similarity(a, a)
    assert cov == 1.0 and ident == 1.0
    b = a.copy()
    pos = rng.choice(3000, 300, replace=False)
    b[pos] = (b[pos] + 1) % 4
    cov, ident = sequence_similarity(a, b)
    assert 0.85 <= ident <= 0.95


def test_sequence_similarity_kmer_fallback():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 150_000).astype(np.uint8)
    cov, ident = sequence_similarity(a, a)
    assert ident > 0.99
    b = rng.integers(0, 4, 150_000).astype(np.uint8)
    cov, ident = sequence_similarity(a, b)
    assert ident < 0.9


@pytest.mark.nightly
@pytest.mark.slow
def test_assemble_heterozygous_bubble_emits_alternate():
    """Diploid-style genome: two haplotypes sharing flanks with a divergent
    middle -> assembly should still produce contigs and classify bubbles."""
    rng = np.random.default_rng(3)
    flank1 = rng.integers(0, 4, 5000).astype(np.uint8)
    mid_a = rng.integers(0, 4, 4000).astype(np.uint8)
    mid_b = rng.integers(0, 4, 4000).astype(np.uint8)  # fully divergent
    flank2 = rng.integers(0, 4, 5000).astype(np.uint8)
    hap_a = np.concatenate([flank1, mid_a, flank2])
    hap_b = np.concatenate([flank1, mid_b, flank2])
    from necat_tpu.io.simulate import ErrorModel
    reads, names = [], []
    for hap, tag in ((hap_a, "a"), (hap_b, "b")):
        rds, _, _, _ = simulate_reads(hap, coverage=7, mean_len=3500,
                                      min_len=2000, max_len=6000,
                                      em=ErrorModel(0.005, 0.005, 0.005),
                                      seed=5 + ord(tag), circular=False)
        for i, r in enumerate(rds):
            reads.append(r)
            names.append(f"{tag}{i}")
    store = ReadStore.from_seqs(reads, names)
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.overlap.overlapper import overlap_all_vs_all
    m4 = overlap_all_vs_all(store, MapOptions(ncan=100))
    res = assemble(store, m4, FilterOptions(), min_contig_length=1000)
    assert res.contigs.n_reads >= 1
    total = res.contigs.total_bases
    assert total >= 10000  # at least one haplotype path reconstructed
