import numpy as np

from necat_tpu.io import simulate, seqio
from necat_tpu.io.readstore import ReadStore
from necat_tpu.polish.polish import PolishOptions, polish_contigs, split_contigs


def test_split_contigs():
    rs = ReadStore.from_seqs([np.zeros(25000, np.uint8), np.ones(9000, np.uint8)],
                             ["a", "b"])
    segs, info = split_contigs(rs, 10000)
    assert segs.n_reads == 4
    assert info == [(0, 0), (0, 10000), (0, 20000), (1, 0)]
    np.testing.assert_array_equal(segs.lengths, [10000, 10000, 5000, 9000])


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
