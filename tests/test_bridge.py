import numpy as np
import pytest

from necat_tpu.bridge.bridge import BridgeOptions, bridge_contigs, find_links
from necat_tpu.io import simulate, seqio
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.m4 import M4Records
from tests.test_trim import mk_m4


def test_find_links_forward_pair():
    # read spans tail of ctg0 into head of ctg1
    lens = np.array([10000, 8000])
    m4 = mk_m4([
        dict(qid=0, sid=0, qdir=0, qoff=0, qend=4000, qsize=9000,
             soff=6100, send=10000, ssize=10000),
        dict(qid=0, sid=1, qdir=0, qoff=4500, qend=9000, qsize=9000,
             soff=0, send=4480, ssize=8000),
    ])
    links = find_links(m4, lens, BridgeOptions(min_support=1))
    assert (0, 0, 1, 0) in links
    (rid, gs, ge), = links[(0, 0, 1, 0)]
    assert rid == 0 and gs == 4000 and ge == 4500


def test_find_links_respects_end_window():
    lens = np.array([10000, 8000])
    # first placement ends 3000 away from ctg0's tail -> no link
    m4 = mk_m4([
        dict(qid=0, sid=0, qdir=0, qoff=0, qend=4000, qsize=9000,
             soff=3000, send=7000, ssize=10000),
        dict(qid=0, sid=1, qdir=0, qoff=4500, qend=9000, qsize=9000,
             soff=0, send=4480, ssize=8000),
    ])
    links = find_links(m4, lens, BridgeOptions(min_support=1))
    assert len(links) == 0


@pytest.mark.slow
def test_bridge_contigs_end_to_end():
    """Genome split into two contigs with a gap; raw reads spanning the gap
    must merge them into one bridged contig."""
    G = simulate.random_genome(40000, seed=51)
    ctg0 = G[:18000].copy()
    ctg1 = G[20000:40000].copy()   # 2 kb gap between contigs
    contigs = ReadStore.from_seqs([ctg0, ctg1], ["c0", "c1"])
    em = simulate.ErrorModel(sub=0.01, ins=0.01, dele=0.01)
    rng = np.random.default_rng(9)
    # reads spanning the junction region [14000, 26000) plus some background
    reads = []
    for s in (13000, 14500, 15500):
        reads.append(simulate.mutate(G[s:s + 12000], em, rng))
    for s in (2000, 30000):
        reads.append(simulate.mutate(G[s:s + 8000], em, rng))
    # one reverse-strand spanning read
    reads.append(seqio.revcomp(simulate.mutate(G[14000:25000], em, rng)))
    raw = ReadStore.from_seqs(reads)

    bridged = bridge_contigs(contigs, raw, opts=BridgeOptions(min_support=2))
    assert bridged.n_reads == 1, f"expected one bridged contig, got {bridged.n_reads}"
    blen = int(bridged.lengths[0])
    assert abs(blen - 40000) < 800, f"bridged length {blen}"
    # the junction region must match the true genome
    c = bridged.get(0)
    if not np.array_equal(c[:40], G[:40]):
        c = seqio.revcomp(c)
    win = c[17000:23000]
    d = simulate.banded_edit_distance(win, G[16500:23500], band=700,
                                      b_prefix_free=True, b_suffix_free=True)
    assert d < 300, f"junction region edit distance {d}"


def test_bridge_no_links_keeps_contigs():
    contigs = ReadStore.from_seqs([np.zeros(5000, np.uint8) + 1,
                                   np.zeros(4000, np.uint8) + 2], ["a", "b"])
    raw = ReadStore.from_seqs([np.zeros(3000, np.uint8)])
    out = bridge_contigs(contigs, raw, m4=M4Records.empty())
    assert out.n_reads == 2
    assert sorted(out.lengths.tolist()) == [4000, 5000]


@pytest.mark.slow
def test_repeat_guard_avoids_chimeric_join():
    """A repeat contig R with true adjacencies A-R-B and C-R-D: per-end greedy
    support would chain A->R->D (a chimera) when A->R and R->D happen to have
    the most support. The ambiguity guard (conservative CheckRepeat,
    contig_graph.cpp:206-253) must leave R unjoined instead."""
    rng = np.random.default_rng(77)
    A = simulate.random_genome(6000, seed=70)
    B = simulate.random_genome(6000, seed=71)
    C = simulate.random_genome(6000, seed=72)
    D = simulate.random_genome(6000, seed=73)
    R = simulate.random_genome(3000, seed=74)
    contigs = ReadStore.from_seqs([A, B, C, D, R], list("abcdr"))
    em = simulate.ErrorModel(sub=0.01, ins=0.01, dele=0.01)
    reads = []
    # genome 1: ...A R B...  genome 2: ...C R D...
    g1 = np.concatenate([A, R, B])
    g2 = np.concatenate([C, R, D])
    for _ in range(4):    # A->R strongly supported
        reads.append(simulate.mutate(g1[2500:8500], em, rng))
    for _ in range(2):    # R->B weakly
        reads.append(simulate.mutate(g1[6500:12500], em, rng))
    for _ in range(2):    # C->R weakly
        reads.append(simulate.mutate(g2[2500:8500], em, rng))
    for _ in range(4):    # R->D strongly
        reads.append(simulate.mutate(g2[6500:12500], em, rng))
    raw = ReadStore.from_seqs(reads)

    def has_chimera(store):
        # a chimeric contig contains A's suffix followed by D's prefix
        for i in range(store.n_reads):
            c = store.get(i)
            for seq in (c, seqio.revcomp(c)):
                sA = simulate.banded_edit_distance(A[-500:], seq[:0], band=1)
                # search A-suffix immediately followed (within 4kb) by D-prefix
                # via exact 40-mer anchors (reads are ~1% error; contigs exact)
                a_tag = A[-40:].tobytes()
                d_tag = D[:40].tobytes()
                sb = seq.tobytes()
                pa = sb.find(a_tag)
                pd = sb.find(d_tag)
                if pa >= 0 and pd >= 0 and 0 < pd - pa < 4000:
                    return True
        return False

    # select_branch="one" (reference default): only one branching step per
    # chain, so the walk cannot thread A->R->D
    out = bridge_contigs(contigs, raw,
                         opts=BridgeOptions(min_support=2, use_c2c=False))
    assert not has_chimera(out), "branch policy failed to prevent chimera"

    # select_branch="best" follows every mutual-best edge and DOES create the
    # A-R-D chimera (sanity that the scenario exercises the policy)
    out2 = bridge_contigs(contigs, raw,
                          opts=BridgeOptions(min_support=2, use_c2c=False,
                                             select_branch="best"))
    assert has_chimera(out2), "test scenario no longer produces the chimera"


@pytest.mark.slow
def test_contig_graph_chain_with_covered_edge():
    """ContigGraph port (VERDICT r3 #6): a 4-contig chain where a long read
    also supports the DIRECT c0->c2 link must still emit c1 between c0 and c2
    (RemoveCoveredEdges turns the direct edge into a macro-edge,
    contig_graph.cpp:135-204 + GetSeqArea covered_ recursion); the whole
    chain joins into one bridged contig covering the genome."""
    G = simulate.random_genome(36000, seed=77)
    # c1 is SHORT (1.9 kb): the covered-edge rule fires only when the middle
    # contig fits within 2 windows (GapLength algebra, contig_graph.cpp:147)
    bounds = [(0, 10000), (10300, 12200), (12500, 23000), (23800, 36000)]
    contigs = ReadStore.from_seqs([G[s:e].copy() for s, e in bounds],
                                  [f"c{i}" for i in range(4)])
    em = simulate.ErrorModel(sub=0.01, ins=0.01, dele=0.01)
    rng = np.random.default_rng(19)
    reads = []
    # reads spanning c0-c1-c2 (placements on all three support c0->c1,
    # c1->c2 AND the direct c0->c2 with shared reads -> covered macro-edge)
    for s in (4000, 5000, 6000):
        reads.append(simulate.mutate(G[s:s + 12000], em, rng))
    # reads over the c2-c3 junction
    for s in (19000, 20000, 21000):
        reads.append(simulate.mutate(G[s:s + 10000], em, rng))
    raw = ReadStore.from_seqs(reads)

    bridged = bridge_contigs(contigs, raw,
                             opts=BridgeOptions(min_support=2,
                                                min_align_size=1500))
    assert bridged.n_reads == 1, \
        f"expected one bridged contig, got {bridged.n_reads}"
    blen = int(bridged.lengths[0])
    assert 0.95 * 36000 <= blen <= 1.05 * 36000, blen
    # every contig's interior must appear (c1/c2 not skipped by the covered
    # direct link): sample a unique 100-mer from each contig's middle
    out = bridged.get(0)
    canon = out.tobytes()
    canon_rc = seqio.revcomp(out).tobytes()
    for s, e in bounds:
        probe = G[(s + e) // 2:(s + e) // 2 + 100].tobytes()
        assert probe in canon or probe in canon_rc, f"contig [{s},{e}) missing"


def test_covered_middle_not_duplicated_any_id_order():
    """Advisor r4 (high): when the covered macro-edge's MIDDLE contig has an
    id that sorts BEFORE the chain start, its singleton path used to be
    emitted standalone and then re-emitted inside the chain via expand() —
    total bases exceeded the genome. Every id permutation must emit each
    contig exactly once."""
    G = simulate.random_genome(36000, seed=77)
    bounds = [(0, 10000), (10300, 12200), (12500, 23000), (23800, 36000)]
    em = simulate.ErrorModel(sub=0.01, ins=0.01, dele=0.01)
    rng = np.random.default_rng(19)
    reads = [simulate.mutate(G[s:s + 12000], em, rng)
             for s in (4000, 5000, 6000)]
    reads += [simulate.mutate(G[s:s + 10000], em, rng)
              for s in (19000, 20000, 21000)]
    raw = ReadStore.from_seqs(reads)
    # middle contig (genome segment 1) first: its node id sorts before the
    # chain start's
    perm = [1, 0, 2, 3]
    contigs = ReadStore.from_seqs([G[bounds[p][0]:bounds[p][1]].copy()
                                   for p in perm],
                                  [f"c{i}" for i in range(4)])
    bridged = bridge_contigs(contigs, raw,
                             opts=BridgeOptions(min_support=2,
                                                min_align_size=1500))
    total = int(bridged.lengths.sum())
    assert total <= int(1.05 * 36000), \
        f"duplicated contig: {bridged.n_reads} seqs, {total} bases"
    assert bridged.n_reads == 1, bridged.n_reads
