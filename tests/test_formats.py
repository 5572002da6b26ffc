"""Interop formats: OVL overlap loading, binary packed store, DUST masking."""

import numpy as np

from necat_tpu.io.readstore import ReadStore, dump_packed, load_packed
from necat_tpu.overlap.m4 import M4Records
from necat_tpu.utils.dust import (dust_intervals, is_nonrepeat_sequence,
                                  masked_size)


def test_ovl_load_and_dispatch(tmp_path):
    p = tmp_path / "x.ovl"
    # aid bid score ident astrand astart aend alen bstrand bstart bend blen type
    p.write_text("1 2 500 98.5 0 10 900 1000 0 5 880 950 overlap\n"
                 "3 4 400 97.0 0 0 500 800 1 100 600 700 overlap\n")
    m = M4Records.load_any(p)
    assert len(m) == 2
    assert int(m.qid[0]) == 1 and float(m.ident[0]) == 98.5
    # second record had bstrand=1 -> normalized to sdir=0 with mirrored coords
    assert int(m.sdir[1]) == 0
    assert int(m.qdir[1]) == 1
    assert int(m.soff[1]) == 700 - 600 and int(m.send[1]) == 700 - 100
    assert int(m.qoff[1]) == 800 - 500 and int(m.qend[1]) == 800


def test_load_any_m4_roundtrip(tmp_path):
    m = M4Records(
        qid=np.array([7], np.int32), sid=np.array([9], np.int32),
        ident=np.array([95.5], np.float32), vscore=np.array([123], np.int32),
        qdir=np.array([1], np.int8), qoff=np.array([10], np.int32),
        qend=np.array([500], np.int32), qsize=np.array([600], np.int32),
        sdir=np.array([0], np.int8), soff=np.array([20], np.int32),
        send=np.array([510], np.int32), ssize=np.array([700], np.int32))
    p = tmp_path / "y.m4.gz"
    m.save(p)
    m2 = M4Records.load_any(p)
    assert len(m2) == 1 and int(m2.qend[0]) == 500


def test_packed_store_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 4, int(n)).astype(np.uint8)
            for n in rng.integers(50, 3000, 20)]
    rs = ReadStore.from_seqs(seqs, [f"read{i}" for i in range(20)])
    p = tmp_path / "reads.ntpc"
    dump_packed(rs, p)
    rs2 = load_packed(p)
    assert rs2.n_reads == rs.n_reads
    assert rs2.names == rs.names
    assert np.array_equal(rs2.offsets, rs.offsets)
    for i in range(rs.n_reads):
        assert np.array_equal(rs2.get(i), rs.get(i))


def test_dust_masks_homopolymer_not_random():
    rng = np.random.default_rng(1)
    rand = rng.integers(0, 4, 5000).astype(np.uint8)
    assert masked_size(rand) == 0
    homo = np.zeros(5000, np.uint8)  # poly-A
    assert masked_size(homo) > 4500
    # random read with an embedded 500bp homopolymer: only that region masks
    mixed = rand.copy()
    mixed[2000:2500] = 2
    ivs = dust_intervals(mixed)
    assert len(ivs) == 1
    s, e = ivs[0]
    assert 1900 <= s <= 2060 and 2440 <= e <= 2600


def test_is_nonrepeat_sequence():
    rng = np.random.default_rng(2)
    assert is_nonrepeat_sequence(rng.integers(0, 4, 3000).astype(np.uint8))
    assert not is_nonrepeat_sequence(np.tile(np.array([0, 1], np.uint8), 1500))


def test_m4a_and_paf_save_roundtrip(tmp_path):
    """save() extension dispatch: .m4a carries read names (ToM4aLine,
    overlap_store.cpp:297-307); .paf round-trips through load_paf."""
    m4 = M4Records(
        qid=np.array([0, 1], np.int32), sid=np.array([1, 2], np.int32),
        ident=np.array([91.5, 88.25], np.float32),
        vscore=np.array([500, 400], np.int32),
        qdir=np.array([0, 1], np.int8),
        qoff=np.array([10, 20], np.int32), qend=np.array([900, 800], np.int32),
        qsize=np.array([1000, 1000], np.int32),
        sdir=np.zeros(2, np.int8),
        soff=np.array([5, 50], np.int32), send=np.array([890, 830], np.int32),
        ssize=np.array([950, 1200], np.int32))
    names = ["ra", "rb", "rc"]
    p_m4a = tmp_path / "x.m4a"
    m4.save(p_m4a, names=names)
    txt = open(p_m4a).read().splitlines()
    assert txt[0].split()[:2] == ["ra", "rb"]
    assert len(txt) == 2 and len(txt[0].split()) == 12

    p_paf = tmp_path / "x.paf.gz"
    m4.save(p_paf, names=names)
    back = M4Records.load_any(p_paf, name2id={n: i for i, n in enumerate(names)})
    assert len(back) == 2
    np.testing.assert_array_equal(back.qid, m4.qid)
    np.testing.assert_array_equal(back.sid, m4.sid)
    np.testing.assert_array_equal(back.qdir, m4.qdir)
    # PAF stores forward-strand query coords; loader converts back
    np.testing.assert_array_equal(back.qoff, m4.qoff)
    np.testing.assert_array_equal(back.qend, m4.qend)
    np.testing.assert_array_equal(back.soff, m4.soff)
    np.testing.assert_array_equal(back.send, m4.send)
