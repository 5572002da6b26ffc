import numpy as np
import pytest

from necat_tpu.index.kmer_index import KmerIndex, kmer_hashes_flat, query_kmer_hashes
from necat_tpu.io.readstore import ReadStore
from necat_tpu.io import simulate


def brute_kmer_positions(bases, offsets, k):
    """Oracle: dict hash -> sorted positions, excluding boundary-crossing kmers."""
    out = {}
    for r in range(len(offsets) - 1):
        s, e = offsets[r], offsets[r + 1]
        for p in range(s, e - k + 1):
            h = 0
            for j in range(k):
                h = (h << 2) | int(bases[p + j])
            out.setdefault(h, []).append(p)
    return out


def test_kmer_hashes_flat():
    bases = np.array([0, 1, 2, 3, 0], dtype=np.uint8)  # ACGTA
    h = kmer_hashes_flat(bases, 3)
    # ACG = 0b000110 = 6; CGT = 0b011011 = 27; GTA = 0b101100 = 44
    assert h.tolist() == [6, 27, 44]


def test_index_lookup_matches_oracle():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 4, size=n).astype(np.uint8) for n in [200, 150, 300]]
    rs = ReadStore.from_seqs(seqs)
    k = 7
    idx = KmerIndex.build(rs.bases, rs.offsets, k=k, occ_cutoff=500, n_bucket_bits=8)
    oracle = brute_kmer_positions(rs.bases, rs.offsets, k)
    assert idx.n_kmers == sum(len(v) for v in oracle.values())

    import jax.numpy as jnp
    queries = np.array(list(oracle.keys())[:50] + [0, (1 << (2 * k)) - 1], dtype=np.int32)
    start, count = idx.lookup_ranges(jnp.asarray(queries))
    start, count = np.asarray(start), np.asarray(count)
    pos_arr = np.asarray(idx.sorted_positions)
    for i, q in enumerate(queries):
        expect = sorted(oracle.get(int(q), []))
        got = sorted(pos_arr[start[i]:start[i] + count[i]].tolist())
        assert got == expect, f"hash {q}"


def test_index_occ_cutoff():
    # one kmer repeated many times
    seqs = [np.tile(np.array([0, 1, 2, 3], np.uint8), 50)]  # ACGT x50
    rs = ReadStore.from_seqs(seqs)
    idx = KmerIndex.build(rs.bases, rs.offsets, k=4, occ_cutoff=10, n_bucket_bits=4)
    import jax.numpy as jnp
    # ACGT hash = 0b00011011 = 27 occurs 50 times -> zeroed
    start, count = idx.lookup_ranges(jnp.asarray(np.array([27], np.int32)))
    assert int(count[0]) == 0


def test_query_kmer_hashes():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 4, size=(2, 64)).astype(np.uint8)
    lens = np.array([64, 20], np.int32)
    k, w = 5, 7
    h, qoffs, valid = query_kmer_hashes(jnp.asarray(batch), jnp.asarray(lens), k, w)
    h, qoffs, valid = np.asarray(h), np.asarray(qoffs), np.asarray(valid)
    for b in range(2):
        for s, off in enumerate(qoffs):
            if off + k <= lens[b]:
                expect = 0
                for j in range(k):
                    expect = (expect << 2) | int(batch[b, off + j])
                assert valid[b, s]
                assert h[b, s] == expect
            else:
                assert not valid[b, s]


def test_native_kmer_index_matches_numpy():
    """The C++ radix-sort index build must produce exactly the numpy build."""
    import os
    from necat_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    lens = rng.integers(20, 4000, 40)
    bases = rng.integers(0, 4, int(lens.sum())).astype(np.uint8)
    offsets = np.r_[0, np.cumsum(lens)].astype(np.int64)
    k, nb = 13, 12
    nat = native.build_kmer_index(bases, offsets, k, nb)
    assert nat is not None
    # force the numpy fallback path for the comparison build
    orig = native.build_kmer_index
    native.build_kmer_index = lambda *a, **kw: None
    try:
        idx = KmerIndex.build(bases, offsets, k=k, n_bucket_bits=nb)
    finally:
        native.build_kmer_index = orig
    sh, sp, bs = nat
    np.testing.assert_array_equal(sh, np.asarray(idx.sorted_hashes))
    np.testing.assert_array_equal(sp, np.asarray(idx.sorted_positions))
    np.testing.assert_array_equal(bs, np.asarray(idx.bucket_starts))


def test_device_build_matches_host_build():
    """build_on_device (pow2-padded, sentinel-hash tail) must answer every
    lookup identically to the host build — same (start offsets differ by
    padding but) same per-query position lists."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    seqs = [rng.integers(0, 4, size=n).astype(np.uint8)
            for n in [3000, 4500, 12, 2200]]     # one read shorter than k
    rs = ReadStore.from_seqs(seqs)
    k = 15
    host = KmerIndex.build(rs.bases, rs.offsets, k=k, occ_cutoff=50)
    dev = KmerIndex.build_on_device(rs, k=k, occ_cutoff=50)
    oracle = brute_kmer_positions(rs.bases, rs.offsets, k)

    qs = list(oracle.keys())[:200] + [0, (1 << (2 * k)) - 1]
    queries = jnp.asarray(np.array(qs, dtype=np.int32))
    hs, hc = host.lookup_ranges(queries)
    ds, dc = dev.lookup_ranges(queries)
    hs, hc = np.asarray(hs), np.asarray(hc)
    ds, dc = np.asarray(ds), np.asarray(dc)
    assert np.array_equal(hc, dc), "counts differ"
    hp = np.asarray(host.sorted_positions)
    dp = np.asarray(dev.sorted_positions)
    for i in range(len(qs)):
        assert np.array_equal(hp[hs[i]:hs[i] + hc[i]],
                              dp[ds[i]:ds[i] + dc[i]]), f"query {i}"
