import numpy as np
import pytest

from necat_tpu.io import seqio, simulate
from necat_tpu.io.readstore import ReadStore, pack_2bit, unpack_2bit


def test_encode_decode_roundtrip():
    s = "ACGTACGTNNGT"
    codes = seqio.encode_seq(s)
    assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 2, 3]
    assert seqio.decode_seq(codes[:8]) == "ACGTACGT"


def test_revcomp():
    codes = seqio.encode_seq("AACGT")
    rc = seqio.revcomp(codes)
    assert seqio.decode_seq(rc) == "ACGTT"


def test_fasta_roundtrip(tmp_path):
    names = ["read1", "read2 with description", "read3"]
    seqs = [seqio.encode_seq("ACGT" * 10), seqio.encode_seq("GGCC"), seqio.encode_seq("T" * 100)]
    p = tmp_path / "x.fasta"
    seqio.write_fasta(p, [n.split()[0] for n in names], seqs)
    names2, seqs2 = seqio.read_fasta(p)
    assert names2 == ["read1", "read2", "read3"]
    for a, b in zip(seqs, seqs2):
        np.testing.assert_array_equal(a, b)


def test_fasta_gz_and_multiline(tmp_path):
    p = tmp_path / "x.fa.gz"
    seqs = [seqio.encode_seq("ACGTACGTAC"), seqio.encode_seq("TTTT")]
    seqio.write_fasta(p, ["a", "b"], seqs, width=4)
    names, seqs2 = seqio.read_fasta(p)
    assert names == ["a", "b"]
    for a, b in zip(seqs, seqs2):
        np.testing.assert_array_equal(a, b)


def test_fastq(tmp_path):
    p = tmp_path / "x.fastq"
    with open(p, "w") as f:
        f.write("@r1 desc\nACGT\n+\nIIII\n@r2\nGGG\n+\nIII\n")
    names, seqs = seqio.read_fasta(p)
    assert names == ["r1", "r2"]
    assert seqio.decode_seq(seqs[0]) == "ACGT"
    assert seqio.decode_seq(seqs[1]) == "GGG"


def test_readstore_basics():
    seqs = [seqio.encode_seq(s) for s in ["ACGT", "GG", "TTTTTT"]]
    rs = ReadStore.from_seqs(seqs)
    assert rs.n_reads == 3
    assert rs.total_bases == 12
    np.testing.assert_array_equal(rs.lengths, [4, 2, 6])
    np.testing.assert_array_equal(rs.get(1), seqs[1])
    np.testing.assert_array_equal(rs.get(0, rc=True), seqio.revcomp(seqs[0]))


def test_n50():
    # lengths 10, 5, 3, 2 -> total 20, half 10 -> N50 = 10
    rs = ReadStore.from_seqs([np.zeros(n, np.uint8) for n in [2, 10, 3, 5]])
    n50, n = rs.n50()
    assert n50 == 10
    assert n == 1


def test_longest_to_coverage():
    rs = ReadStore.from_seqs([np.zeros(n, np.uint8) for n in [100, 500, 300, 200]])
    idx = rs.longest_to_coverage(genome_size=100, coverage=8)  # target 800 bases
    # longest-first: 500 + 300 = 800 -> keep reads 1 and 2
    assert sorted(idx.tolist()) == [1, 2]


def test_volumes():
    rs = ReadStore.from_seqs([np.zeros(n, np.uint8) for n in [100, 100, 100, 100]])
    vols = rs.volumes(vol_size=250)
    assert vols == [(0, 2), (2, 4)]


def test_pack_unpack_2bit():
    rng = np.random.default_rng(0)
    bases = rng.integers(0, 4, size=1000).astype(np.uint8)
    words = pack_2bit(bases)
    assert words.dtype == np.uint32
    np.testing.assert_array_equal(unpack_2bit(words, 1000), bases)


def test_padded_batch():
    rs = ReadStore.from_seqs([seqio.encode_seq("ACGT"), seqio.encode_seq("GGGGGG")])
    batch, lens = rs.padded_batch(np.array([0, 1]), multiple=8)
    assert batch.shape == (2, 8)
    np.testing.assert_array_equal(lens, [4, 6])
    assert batch[0, :4].tolist() == [0, 1, 2, 3]
    assert batch[0, 4:].tolist() == [0] * 4


def test_simulate_reads_identity():
    genome = simulate.random_genome(20000, seed=0)
    em = simulate.ErrorModel(sub=0.04, ins=0.04, dele=0.04)
    reads, starts, strands, lens = simulate.simulate_reads(
        genome, coverage=2, mean_len=5000, min_len=2000, max_len=8000, em=em, seed=1)
    assert sum(len(r) for r in reads) >= 2 * len(genome)
    # identity of noisy reads to truth should be ~ 1 - total_error (within slack)
    ident = simulate.identity_to_genome(reads[0], genome, int(starts[0]), int(strands[0]), int(lens[0]))
    assert 82.0 < ident < 95.0


def test_banded_edit_distance_exact():
    a = seqio.encode_seq("ACGTACGT")
    b = seqio.encode_seq("ACGAACGT")
    assert simulate.banded_edit_distance(a, b, band=8) == 1
    b2 = seqio.encode_seq("ACGTCGT")
    assert simulate.banded_edit_distance(a, b2, band=8) == 1
    assert simulate.banded_edit_distance(a, a, band=8) == 0
