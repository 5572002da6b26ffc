import numpy as np
import pytest

from necat_tpu.io import simulate
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.m4 import M4Records
from necat_tpu.overlap.options import MapOptions
from necat_tpu.overlap.overlapper import overlap_all_vs_all
from necat_tpu.trim.lcr import (TrimOptions, largest_cover_range, qualified_m4_mask,
                                trim_reads, _chimeric_pair_check)


def mk_m4(rows):
    """rows: list of dicts with m4 fields (defaults filled)."""
    n = len(rows)
    d = dict(
        qid=np.zeros(n, np.int32), sid=np.zeros(n, np.int32),
        ident=np.full(n, 95.0, np.float32), vscore=np.full(n, 100, np.int32),
        qdir=np.zeros(n, np.int8), qoff=np.zeros(n, np.int32), qend=np.zeros(n, np.int32),
        qsize=np.zeros(n, np.int32), sdir=np.zeros(n, np.int8),
        soff=np.zeros(n, np.int32), send=np.zeros(n, np.int32), ssize=np.zeros(n, np.int32))
    for i, row in enumerate(rows):
        for k, v in row.items():
            d[k][i] = v
    return M4Records(**d)


def test_m4_roundtrip(tmp_path):
    m4 = mk_m4([dict(qid=3, sid=1, qoff=10, qend=500, qsize=600, soff=0, send=480, ssize=2000),
                dict(qid=4, sid=2, qdir=1, qoff=0, qend=100, qsize=100, soff=5, send=99, ssize=200)])
    p = tmp_path / "x.m4.gz"
    m4.save(p)
    m42 = M4Records.load(p)
    assert len(m42) == 2
    np.testing.assert_array_equal(m42.qid, m4.qid)
    np.testing.assert_array_equal(m42.soff, m4.soff)
    np.testing.assert_allclose(m42.ident, m4.ident, atol=0.01)


def test_m4_swap_roles_rev():
    m4 = mk_m4([dict(qid=3, sid=1, qdir=1, qoff=100, qend=400, qsize=500,
                     soff=50, send=350, ssize=1000)])
    sw = m4.swap_roles()
    assert sw.qid[0] == 1 and sw.sid[0] == 3
    # mirrored: new qoff = ssize - send = 650, new qend = ssize - soff = 950
    assert (sw.qoff[0], sw.qend[0]) == (650, 950)
    assert (sw.soff[0], sw.send[0]) == (100, 400)
    assert sw.qsize[0] == 1000 and sw.ssize[0] == 500


def test_qualified_m4():
    # q fully covered -> qualified
    a = mk_m4([dict(qoff=5, qend=995, qsize=1000, soff=100, send=1100, ssize=5000)])
    assert qualified_m4_mask(a)[0]
    # dovetail: q right end to s left end, >= 2000 span
    b = mk_m4([dict(qoff=500, qend=3000, qsize=3010, soff=10, send=2500, ssize=8000)])
    assert qualified_m4_mask(b)[0]
    # internal (repeat-like) alignment -> not qualified
    c = mk_m4([dict(qoff=500, qend=3000, qsize=6000, soff=1000, send=3500, ssize=8000)])
    assert not qualified_m4_mask(c)[0]


def test_largest_cover_range_simple():
    # two overlapping intervals + one detached
    r = largest_cover_range(np.array([0, 400, 5000]), np.array([500, 1000, 5200]),
                            min_cov=1, min_ovlp=1)
    assert r == (0, 1000)


def test_largest_cover_range_min_cov():
    # depth 2 only in [200, 500)
    r = largest_cover_range(np.array([0, 200, 200]), np.array([500, 500, 900]),
                            min_cov=2, min_ovlp=1)
    assert r == (200, 500)


def test_chimeric_pair_check_case_ii():
    # same query region aligned to two disjoint target halves, breakpoints close
    r = _chimeric_pair_check(0, 4800, 10, 4790, 0, 4600, 4800, 9400,
                             qsize=4800, tsize=9500)
    assert r != 0


@pytest.mark.slow
def test_trim_end_to_end_with_chimera():
    G = 40000
    genome = simulate.random_genome(G, seed=31)
    # trim operates on *corrected* reads (~99% identity; pair identity ~97%)
    em = simulate.ErrorModel(sub=0.005, ins=0.005, dele=0.005)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=8, mean_len=5000, min_len=3500, max_len=7000, em=em,
        seed=13, circular=False)
    # append a chimeric read: two distant segments joined
    chim = np.concatenate([genome[2000:5000], genome[25000:28000]])
    chim = simulate.mutate(chim, em, np.random.default_rng(5))
    reads.append(chim)
    rs = ReadStore.from_seqs(reads)
    chim_id = rs.n_reads - 1

    m4 = overlap_all_vs_all(rs, MapOptions(kmer_size=13, max_hits=1 << 19, max_pairs=4096),
                            min_align_size=400, band_width=64)
    assert len(m4) > 0
    trimmed, kept, ranges = trim_reads(rs, m4, TrimOptions())
    assert trimmed.n_reads >= rs.n_reads * 0.6
    # chimeric read either dropped or clipped to roughly one half
    if chim_id in kept.tolist():
        i = kept.tolist().index(chim_id)
        l, r = ranges[i]
        assert r - l <= len(chim) * 0.7, f"chimera kept nearly whole: [{l},{r}) of {len(chim)}"
    # normal reads keep most of their span
    frac = []
    for i, rid in enumerate(kept):
        if rid == chim_id:
            continue
        l, r = ranges[i]
        frac.append((r - l) / rs.lengths[rid])
    assert np.median(frac) > 0.8


def test_paf_roundtrip(tmp_path):
    from necat_tpu.pipeline import tools
    m4 = mk_m4([dict(qid=3, sid=1, qdir=1, qoff=100, qend=400, qsize=500,
                     soff=50, send=350, ssize=1000, ident=95.0, vscore=280),
                dict(qid=4, sid=2, qdir=0, qoff=0, qend=300, qsize=300,
                     soff=5, send=299, ssize=600, ident=99.0, vscore=290)])
    p_m4 = tmp_path / "x.m4"
    p_paf = tmp_path / "x.paf"
    m4.save(p_m4)
    tools.main(["m4topaf", str(p_m4), str(p_paf)])
    m42 = M4Records.load_paf(p_paf)
    assert len(m42) == 2
    np.testing.assert_array_equal(m42.qid, m4.qid)
    np.testing.assert_array_equal(m42.qdir, m4.qdir)
    np.testing.assert_array_equal(m42.qoff, m4.qoff)   # strand-local coords restored
    np.testing.assert_array_equal(m42.soff, m4.soff)


def test_tools_cli(tmp_path, capsys):
    from necat_tpu.pipeline import tools
    from necat_tpu.io import simulate
    g = simulate.random_genome(10000, seed=1)
    reads, *_ = simulate.simulate_reads(g, coverage=3, mean_len=4000, seed=2)
    p = tmp_path / "r.fasta"
    ReadStore.from_seqs(reads).to_fasta(p)
    assert tools.main(["n50", str(p)]) == 0
    assert tools.main(["stats", str(p)]) == 0
    out = tmp_path / "l.fasta"
    assert tools.main(["longest", str(p), str(out), "10000", "2"]) == 0
    assert ReadStore.from_fasta(out).total_bases >= 20000 * 0.9


@pytest.mark.nightly
@pytest.mark.slow
def test_trim_accurate_reconsensus():
    """TRIM_METHOD=accurate (trim_bases_accurate): outputs are CONSENSUS
    sequences over the cover range — identity to the genome must beat the raw
    reads' ~85%."""
    from necat_tpu.overlap.overlapper import overlap_all_vs_all
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.trim.accurate import trim_reads_accurate
    from necat_tpu.io import simulate
    from necat_tpu.io.readstore import ReadStore

    G = 25000
    genome = simulate.random_genome(G, seed=91)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=10, mean_len=5000, min_len=3500, max_len=6500,
        seed=92)
    rs = ReadStore.from_seqs(reads)
    m4 = overlap_all_vs_all(
        rs, MapOptions(kmer_size=13, max_hits=1 << 18, max_pairs=4096,
                       ncan=100))
    # simulated overlap identities sit near the 91 cutoff; relax it so enough
    # overlaps survive to exercise the consensus pass
    from necat_tpu.trim.accurate import TrimAccurateOptions
    trimmed, kept, ranges = trim_reads_accurate(
        rs, m4, TrimAccurateOptions(min_ident=70.0, cns_min_ident=70.0))
    assert trimmed.n_reads >= rs.n_reads * 0.4
    # each output maps inside its source read's range
    assert (ranges[:, 1] > ranges[:, 0]).all()
    idents = []
    for i in range(min(trimmed.n_reads, 10)):
        rid = int(kept[i])
        l, r = ranges[i]
        frac_l, frac_r = l / len(reads[rid]), r / len(reads[rid])
        s0, L0 = int(st[rid]), int(ln[rid])
        if sd[rid] == 0:
            a, b = s0 + int(frac_l * L0), s0 + int(frac_r * L0)
        else:
            a, b = s0 + int((1 - frac_r) * L0), s0 + int((1 - frac_l) * L0)
        if b - a < 1000:
            continue
        seq = trimmed.get(i) if sd[rid] == 0 else \
            (3 - trimmed.get(i)[::-1]).astype(np.uint8)
        idents.append(simulate.identity_to_genome(seq, genome, a, 0, b - a))
    assert len(idents) >= 3
    assert np.mean(idents) >= 92.0, f"accurate-trim identity {np.mean(idents):.2f}"
