import numpy as np
import pytest

from necat_tpu.io import simulate, seqio
from necat_tpu.io.readstore import ReadStore
from necat_tpu.polish.polish import PolishOptions, polish_contigs, split_contigs


def test_split_contigs():
    rs = ReadStore.from_seqs([np.zeros(25000, np.uint8), np.ones(9000, np.uint8)],
                             ["a", "b"])
    segs, info = split_contigs(rs, 10000)
    assert segs.n_reads == 4
    assert info == [(0, 0, 0), (0, 10000, 10000), (0, 20000, 20000), (1, 0, 0)]
    np.testing.assert_array_equal(segs.lengths, [10000, 10000, 5000, 9000])


def test_split_contigs_halo():
    rng = np.random.default_rng(0)
    rs = ReadStore.from_seqs([rng.integers(0, 4, 25000).astype(np.uint8)],
                             ["a"])
    segs, info = split_contigs(rs, 10000, halo=2000)
    assert info == [(0, 0, 0), (0, 10000, 8000), (0, 20000, 18000)]
    np.testing.assert_array_equal(segs.lengths, [12000, 14000, 7000])
    # window 1 covers [8000, 22000): core [10000, 20000) with 2k halo each side
    np.testing.assert_array_equal(segs.get(1), rs.get(0)[8000:22000])


@pytest.mark.slow
def test_polish_improves_draft():
    rng = np.random.default_rng(3)
    truth = simulate.random_genome(30000, seed=4)
    # draft contig: truth + ~1.5% errors
    draft = simulate.mutate(truth, simulate.ErrorModel(sub=0.006, ins=0.004, dele=0.004), rng)
    contigs = ReadStore.from_seqs([draft], ["ctg0"])
    # raw reads at 12% error
    reads, *_ = simulate.simulate_reads(truth, coverage=12, mean_len=7000, min_len=4000,
                                        max_len=10000, em=simulate.ErrorModel(0.04, 0.04, 0.04),
                                        seed=6, circular=False)
    raw = ReadStore.from_seqs(reads)
    pol = polish_contigs(contigs, raw,
                         opts=PolishOptions(segment_size=16384, min_ident=75.0,
                                            templates_per_batch=2))
    assert pol.n_reads == 1
    c = pol.get(0)

    def ident(c):
        d = simulate.banded_edit_distance(c, truth, band=800)
        return 100 * (1 - d / max(len(c), len(truth)))

    before = ident(draft)
    after = ident(c)
    assert after > before + 0.5, f"polish did not improve: {before:.2f} -> {after:.2f}"
    assert after >= 99.0, f"polished identity {after:.2f}"


@pytest.mark.nightly
@pytest.mark.slow
def test_polish_fixes_planted_long_insertion():
    """A contig missing a 20 bp chunk (every read shows a 20 bp insertion run)
    must be repaired — the reference built u16 deltas for exactly this
    (ctg_cns/fc_correct_one_read.h:17-19); our equivalent is the multi-word
    insb channel (max_delta=22)."""
    rng = np.random.default_rng(11)
    truth = simulate.random_genome(24000, seed=15)
    drop = 17000
    draft = np.concatenate([truth[:drop], truth[drop + 20:]])  # 20 bp missing
    contigs = ReadStore.from_seqs([draft], ["ctg0"])
    reads, *_ = simulate.simulate_reads(
        truth, coverage=14, mean_len=7000, min_len=4000, max_len=10000,
        em=simulate.ErrorModel(0.03, 0.03, 0.03), seed=16, circular=False)
    raw = ReadStore.from_seqs(reads)
    pol = polish_contigs(contigs, raw,
                         opts=PolishOptions(segment_size=16384, min_ident=75.0,
                                            templates_per_batch=2))
    c = pol.get(0)

    def best_substring_ed(hay, needle):
        m = len(needle)
        D0 = np.arange(m + 1, dtype=np.int32)
        ar = np.arange(m + 1, dtype=np.int32)
        best = int(D0[m])
        prev = D0
        for x in hay:
            sub = (needle != x).astype(np.int32)
            base = np.minimum(prev[:-1] + sub, prev[1:] + 1)
            full = np.concatenate(([np.int32(0)], base))
            prev = np.minimum.accumulate(full - ar) + ar
            best = min(best, int(prev[m]))
        return best

    # the dropped 20-mer with 40bp context must reappear (the draft is >= 18
    # edits away from this pattern; contig ends stay at raw-read quality at
    # this toy coverage, so whole-sequence identity is not the right check)
    pattern = truth[16960:17060]
    ed_d = best_substring_ed(draft[16600:17400], pattern)
    ed_c = best_substring_ed(c[16600:17400], pattern)
    assert ed_d >= 15, f"test degenerate: draft already matches (ed {ed_d})"
    assert ed_c <= 4, f"insertion region not restored (ed {ed_c} vs draft {ed_d})"


@pytest.mark.nightly
@pytest.mark.slow
def test_polish_no_seam_identity_dip():
    """Window seams must not show an identity dip: the halo gives boundary
    reads full alignment context and pieces are cut exactly at core edges."""
    rng = np.random.default_rng(23)
    truth = simulate.random_genome(36000, seed=27)
    draft = simulate.mutate(truth, simulate.ErrorModel(0.005, 0.004, 0.004), rng)
    contigs = ReadStore.from_seqs([draft], ["ctg0"])
    reads, *_ = simulate.simulate_reads(
        truth, coverage=14, mean_len=8000, min_len=5000, max_len=11000,
        em=simulate.ErrorModel(0.04, 0.04, 0.04), seed=29, circular=False)
    raw = ReadStore.from_seqs(reads)
    pol = polish_contigs(contigs, raw,
                         opts=PolishOptions(segment_size=8192, min_ident=75.0,
                                            templates_per_batch=2, halo=3000))
    c = pol.get(0)
    # windowed identity around each seam (8192, 16384, 24576) vs the interior
    for seam in (8192, 16384, 24576):
        win = c[max(0, seam - 1200):seam + 1200]
        ref = truth[max(0, seam - 1700):seam + 1700]
        d = simulate.banded_edit_distance(win, ref, band=600,
                                          b_prefix_free=True, b_suffix_free=True)
        assert d <= 24, f"seam {seam}: {d} edits in a 2.4 kb window"


@pytest.mark.slow
def test_unique_placement_filter():
    """filter_m4 role: with one contig the filter is a no-op (byte-identical
    output); with a duplicated contig the ambiguous reads are dropped."""
    import dataclasses
    from necat_tpu.overlap.candidates import Candidates
    from necat_tpu.polish.polish import _filter_unique_placement

    rng = np.random.default_rng(8)
    truth = simulate.random_genome(20000, seed=9)
    draft = simulate.mutate(truth, simulate.ErrorModel(0.005, 0.003, 0.003), rng)
    contigs = ReadStore.from_seqs([draft], ["ctg0"])
    reads, *_ = simulate.simulate_reads(
        truth, coverage=10, mean_len=6000, min_len=4000, max_len=8000,
        em=simulate.ErrorModel(0.04, 0.04, 0.04), seed=10, circular=False)
    raw = ReadStore.from_seqs(reads)
    po = PolishOptions(segment_size=16384, min_ident=75.0,
                       templates_per_batch=2)
    a = polish_contigs(contigs, raw, opts=po)
    b = polish_contigs(contigs, raw,
                       opts=dataclasses.replace(po, unique_placement=False))
    np.testing.assert_array_equal(a.get(0), b.get(0))

    # unit-level ambiguity: read 0 maps equally to two contigs -> dropped;
    # read 1 maps uniquely -> kept toward its best contig only
    c = Candidates(
        qid=np.array([0, 0, 1, 1], np.int32),
        sid=np.array([0, 1, 0, 1], np.int32),
        qdir=np.zeros(4, np.int8), score=np.array([100, 95, 100, 10], np.int32),
        qbeg=np.zeros(4, np.int32), qend=np.full(4, 50, np.int32),
        sbeg=np.zeros(4, np.int32), send=np.full(4, 50, np.int32),
        qsize=np.full(4, 60, np.int32), ssize=np.full(4, 60, np.int32))
    info = [(0, 0, 0), (1, 0, 0)]   # two segments, two different contigs
    kept = _filter_unique_placement(c, info, 0.8)
    assert kept.qid.tolist() == [1]
    assert kept.sid.tolist() == [0]


def test_polish_repairs_collapsed_repeat_low_coverage():
    """VERDICT r5 #5: a 300 bp chunk missing from the draft (collapsed
    repeat) must be restored by the hotspot link-DP reassembly even with only
    ~3 reads covering the site — the reference's u16-delta ctg_cns repairs at
    any coverage (fc_correct_one_read.h:17-20)."""
    rng = np.random.default_rng(21)
    truth = simulate.random_genome(20000, seed=25)
    drop = 9000
    draft = np.concatenate([truth[:drop], truth[drop + 300:]])  # 300 bp missing
    contigs = ReadStore.from_seqs([draft], ["ctg0"])
    em = simulate.ErrorModel(0.03, 0.03, 0.03)
    # exactly 3 reads span the dropped chunk
    reads = [simulate.mutate(truth[s:s + 8000], em, rng)
             for s in (5500, 6500, 7500)]
    # background coverage elsewhere keeps the mapper honest
    reads += [simulate.mutate(truth[s:s + 6000], em, rng)
              for s in (0, 2000, 12000, 14000)]
    raw = ReadStore.from_seqs(reads)
    pol = polish_contigs(contigs, raw,
                         opts=PolishOptions(segment_size=16384, min_ident=75.0,
                                            templates_per_batch=2))
    c = pol.get(0)

    def best_substring_ed(hay, needle):
        m = len(needle)
        ar = np.arange(m + 1, dtype=np.int32)
        prev = ar.copy()
        best = int(prev[m])
        for x in hay:
            sub = (needle != x).astype(np.int32)
            base = np.minimum(prev[:-1] + sub, prev[1:] + 1)
            full = np.concatenate(([np.int32(0)], base))
            prev = np.minimum.accumulate(full - ar) + ar
            best = min(best, int(prev[m]))
        return best

    pattern = truth[drop - 50:drop + 350]      # dropped chunk + context
    ed_d = best_substring_ed(draft[drop - 800:drop + 800], pattern)
    ed_c = best_substring_ed(c[drop - 800:drop + 1200], pattern)
    assert ed_d >= 120, f"test degenerate: draft matches (ed {ed_d})"
    assert ed_c <= 30, f"collapsed repeat not restored (ed {ed_c} vs draft {ed_d})"
