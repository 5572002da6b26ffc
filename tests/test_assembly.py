import numpy as np
import pytest

from necat_tpu.assembly.overlap_filter import (FilterOptions, classify, clamp_ends,
                                               filter_overlaps)
from necat_tpu.assembly.string_graph import StringGraph, vertex, rev_vertex
from necat_tpu.assembly.contigs import assemble, path_to_contig
from necat_tpu.io import simulate, seqio
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.m4 import M4Records
from necat_tpu.overlap.options import MapOptions
from necat_tpu.overlap.overlapper import overlap_all_vs_all
from necat_tpu.trim.lcr import TrimOptions, trim_reads
from tests.test_trim import mk_m4


def test_clamp_and_classify():
    m4 = mk_m4([dict(qid=1, sid=0, qoff=30, qend=4980, qsize=5000,
                     soff=2000, send=6990, ssize=7000)])
    cl = clamp_ends(m4, 100)
    assert cl.qoff[0] == 0 and cl.qend[0] == 5000      # both q hangs <= 100 -> clamped
    assert cl.soff[0] == 2000 and cl.send[0] == 7000   # s left hang kept, right clamped
    a_c, b_c, proper = classify(cl)
    assert a_c[0] and proper[0] and not b_c[0]


def _mk_chain_overlaps(n_reads, read_len, step):
    """Simulated perfect chain: read i covers [i*step, i*step+read_len)."""
    rows = []
    for i in range(n_reads - 1):
        ov = read_len - step
        rows.append(dict(qid=i + 1, sid=i, qoff=0, qend=ov, qsize=read_len,
                         soff=step, send=read_len, ssize=read_len,
                         ident=99.0, vscore=ov))
    return mk_m4(rows)


def test_string_graph_chain():
    n, L, step = 10, 5000, 3000
    m4 = _mk_chain_overlaps(n, L, step)
    lens = np.full(n, L)
    g = StringGraph.from_overlaps(m4, lens, max_overhang=100)
    assert g.n_active() == 2 * (n - 1)
    paths = g.assemble()
    assert len(paths) == 1
    assert len(paths[0]) == n - 1


def test_path_to_contig_exact_join():
    # two reads from one genome, exact overlap
    g = simulate.random_genome(8000, seed=2)
    r0, r1 = g[:5000], g[3000:8000]
    rs = ReadStore.from_seqs([r0, r1])
    m4 = mk_m4([dict(qid=1, sid=0, qoff=0, qend=2000, qsize=5000,
                     soff=3000, send=5000, ssize=5000, ident=100.0, vscore=2000)])
    sg = StringGraph.from_overlaps(m4, rs.lengths, max_overhang=10)
    paths = sg.assemble()
    assert len(paths) == 1
    seq, tiles = path_to_contig(paths[0], rs)
    assert len(seq) == 8000
    np.testing.assert_array_equal(seq, g)
    assert len(tiles) == 2


def test_transitive_reduction():
    # chain a->b->c with shortcut a->c must reduce a->c
    L = 6000
    rows = [
        dict(qid=1, sid=0, qoff=0, qend=4000, qsize=L, soff=2000, send=L, ssize=L,
             ident=99.0, vscore=4000),
        dict(qid=2, sid=1, qoff=0, qend=4000, qsize=L, soff=2000, send=L, ssize=L,
             ident=99.0, vscore=4000),
        dict(qid=2, sid=0, qoff=0, qend=2000, qsize=L, soff=4000, send=L, ssize=L,
             ident=99.0, vscore=2000),
    ]
    m4 = mk_m4(rows)
    g = StringGraph.from_overlaps(m4, np.full(3, L), max_overhang=10)
    assert g.n_active() == 6
    g.mark_transitive_edges()
    assert g.n_active() == 4
    reduced = [k for k, a in g.arcs.items() if a.reduced == "transitive"]
    assert (vertex(0, 0), vertex(2, 0)) in reduced


@pytest.mark.slow
def test_assembly_end_to_end():
    G = 40000
    genome = simulate.random_genome(G, seed=8)
    em = simulate.ErrorModel(sub=0.004, ins=0.003, dele=0.003)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=9, mean_len=7000, min_len=4000, max_len=10000, em=em,
        seed=14, circular=False)
    rs = ReadStore.from_seqs(reads)
    m4 = overlap_all_vs_all(rs, MapOptions(kmer_size=13, max_hits=1 << 19, max_pairs=4096),
                            band_width=64)
    trimmed, _, _ = trim_reads(rs, m4, TrimOptions())
    m4t = overlap_all_vs_all(trimmed, MapOptions(kmer_size=13, max_hits=1 << 19, max_pairs=4096),
                             band_width=64)
    res = assemble(trimmed, m4t, FilterOptions(min_length=2000, min_aligned_length=2000))
    assert res.contigs.n_reads >= 1
    # the top contigs should cover most of the genome (the simulated read set can
    # leave genuine zero-coverage gaps, so allow up to two pieces)
    top = sorted(res.contigs.lengths, reverse=True)[:2]
    assert sum(top) >= G * 0.75, f"top contigs {top}"
    c = res.contigs.get(0)
    # locate by exact 40-mer and check identity vs genome
    pos = None
    for strand in (0, 1):
        gg = genome if strand == 0 else seqio.revcomp(genome)
        for off in range(0, 200, 7):
            idx = gg.tobytes().find(c[off:off + 40].tobytes())
            if idx >= 0:
                pos, ref = idx - off, gg
                break
        if pos is not None:
            break
    assert pos is not None, "contig start not found in genome"
    d = simulate.banded_edit_distance(c, ref[max(0, pos):pos + len(c) + 500], band=1200)
    ident = 100 * (1 - d / len(c))
    assert ident >= 97.0, f"contig identity {ident:.2f}"
    # tiles sanity
    assert len(res.tiles[0]) >= 2
    assert res.tiles[0][0].ctg_start == 0


@pytest.mark.nightly
@pytest.mark.slow
def test_assemble_dump_snapshots(tmp_path):
    """--dump role: graph snapshots + filtered reads (assembly.cpp:126-146)."""
    from necat_tpu.assembly.contigs import assemble
    from necat_tpu.assembly.overlap_filter import FilterOptions
    from necat_tpu.io import simulate
    from necat_tpu.io.readstore import ReadStore
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.overlap.overlapper import overlap_all_vs_all

    genome = simulate.random_genome(20000, seed=2)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=8, mean_len=4000, min_len=2500, max_len=6000, seed=4,
        em=simulate.ErrorModel(sub=0.01, ins=0.01, dele=0.01))
    rs = ReadStore.from_seqs(reads)
    m4 = overlap_all_vs_all(rs, MapOptions(kmer_size=13, max_hits=1 << 19,
                                           max_pairs=4096, ncan=100))
    d = tmp_path / "dump"
    res = assemble(rs, m4, FilterOptions(), dump_dir=str(d))
    for tag in range(4):
        assert (d / f"string_graph_{tag}.txt").exists()
    assert (d / "filtered_reads.txt").exists()
    # later snapshots only ever reduce more arcs
    def actives(p):
        return sum(1 for line in open(p) if line.strip().endswith("active"))
    assert actives(d / "string_graph_0.txt") >= actives(d / "string_graph_3.txt")


def test_trim_circular_overlap():
    from necat_tpu.assembly.contigs import trim_circular_overlap
    from necat_tpu.io import simulate
    rng = np.random.default_rng(3)
    G = simulate.random_genome(120000, seed=61)
    # circular contig: genome + 17 kb wrap, with 1.5% errors
    em = simulate.ErrorModel(0.006, 0.004, 0.004)
    ctg = simulate.mutate(np.concatenate([G, G[:17000]]), em, rng)
    out = trim_circular_overlap(ctg)
    assert abs(len(out) - 120000) < 400, f"trimmed to {len(out)}"
    # non-circular contig untouched
    lin = simulate.mutate(G, em, rng)
    assert len(trim_circular_overlap(lin)) == len(lin)


@pytest.mark.nightly
@pytest.mark.slow
def test_circular_genome_no_duplicated_wrap():
    """A contig walking a CIRCULAR genome must not re-emit its first read:
    the cycle's edge segments sum to the cycle length (assembly.cpp:367-379
    start rule). Round-2 parity showed +21 kb duplication here."""
    from necat_tpu.io import simulate
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.overlap.overlapper import overlap_all_vs_all

    G = 60000
    genome = simulate.random_genome(G, seed=71)
    reads, *_ = simulate.simulate_reads(
        genome, coverage=14, mean_len=8000, min_len=6000, max_len=10000,
        em=simulate.ErrorModel(0.01, 0.01, 0.01), seed=72, circular=True)
    rs = ReadStore.from_seqs(reads)
    m4 = overlap_all_vs_all(
        rs, MapOptions(kmer_size=13, max_hits=1 << 18, max_pairs=8192,
                       ncan=100))
    res = assemble(rs, m4, FilterOptions())
    assert res.contigs.n_reads >= 1
    main_len = int(res.contigs.lengths.max())
    # within 5% of the true cycle length — NOT genome + one read (+13%)
    assert main_len <= G * 1.05, f"contig {main_len} vs genome {G}"
    assert main_len >= G * 0.9, f"contig {main_len} vs genome {G}"


def test_merge_similar_branches_beats_best_chain():
    """Bubble-aware consensus (ConstructContig1, assembly.cpp:229-547):
    similar compound-path branches vote out each other's errors — the merged
    segment must be closer to the truth than the best chain alone (round-3
    gap: best-chain-only emission)."""
    from necat_tpu.assembly.contigs import merge_similar_branches
    from necat_tpu.io import simulate

    rng = np.random.default_rng(11)
    truth = simulate.random_genome(4000, seed=12)
    em = simulate.ErrorModel(0.004, 0.003, 0.003)   # ~1% per branch
    backbone = simulate.mutate(truth, em, rng)
    alts = [simulate.mutate(truth, em, rng) for _ in range(2)]
    merged = merge_similar_branches(backbone, alts)

    def ident(s):
        return simulate.identity_to_genome(s, truth, 0, 0, len(truth))

    assert ident(merged) > ident(backbone) + 0.3, \
        (ident(merged), ident(backbone))


def test_merge_similar_branches_single_branch_noop():
    from necat_tpu.assembly.contigs import merge_similar_branches

    rng = np.random.default_rng(4)
    backbone = rng.integers(0, 4, 3000).astype(np.uint8)
    out = merge_similar_branches(backbone, [])
    assert np.array_equal(out, backbone)
