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


def test_m4a_load_roundtrip(tmp_path):
    """m4a READ interop (FromM4aLine, overlap_store.cpp:95): the reference's
    bridge-stage interchange format must round-trip, with and without an
    external name->id mapping."""
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
    p = tmp_path / "x.m4a.gz"
    m4.save(p, names=names)
    back = M4Records.load_m4a(p, {n: i for i, n in enumerate(names)})
    for f in ("qid", "sid", "qdir", "qoff", "qend", "qsize", "soff", "send",
              "ssize", "vscore"):
        np.testing.assert_array_equal(getattr(back, f), getattr(m4, f))
    np.testing.assert_allclose(back.ident, m4.ident, atol=0.01)
    # auto-id mode returns (m4, names) in first-seen order
    back2, names2 = M4Records.load_m4a(p)
    assert names2 == ["ra", "rb", "rc"]
    np.testing.assert_array_equal(back2.qid, [0, 1])
    np.testing.assert_array_equal(back2.sid, [1, 2])
    # load_any dispatches .m4a too
    back3 = M4Records.load_any(p, {n: i for i, n in enumerate(names)})
    np.testing.assert_array_equal(back3.qid, m4.qid)


def test_ovl_save_roundtrip(tmp_path):
    """OVL WRITE interop: save_ovl lines parse back via load_ovl."""
    m4 = M4Records(
        qid=np.array([3, 4], np.int32), sid=np.array([4, 5], np.int32),
        ident=np.array([95.0, 87.5], np.float32),
        vscore=np.array([100, 90], np.int32),
        qdir=np.array([1, 0], np.int8),
        qoff=np.array([0, 7], np.int32), qend=np.array([500, 600], np.int32),
        qsize=np.array([520, 610], np.int32),
        sdir=np.zeros(2, np.int8),
        soff=np.array([3, 9], np.int32), send=np.array([505, 599], np.int32),
        ssize=np.array([700, 620], np.int32))
    p = tmp_path / "x.ovl"
    m4.save(p)
    back = M4Records.load_any(p)
    for f in ("qid", "sid", "qdir", "qoff", "qend", "qsize", "soff", "send",
              "ssize", "vscore"):
        np.testing.assert_array_equal(getattr(back, f), getattr(m4, f))


def test_fsa_option_strings():
    """FSA_* config strings reach the fsa layer (necat.pl:1228-1245 passes
    them verbatim); unknown flags warn instead of vanishing."""
    from necat_tpu.assembly.contigs import AssembleOptions
    from necat_tpu.assembly.overlap_filter import FilterOptions
    from necat_tpu.bridge.bridge import BridgeOptions

    fo = FilterOptions.from_string("--bestn=3 --min_length 1000 "
                                   "--max_overhang=500")
    assert (fo.bestn, fo.min_length, fo.max_overhang) == (3, 1000, 500)
    assert FilterOptions.from_string("--no_such_flag=5") == FilterOptions()

    ao = AssembleOptions.from_string("--max_spur_length=10000 "
                                     "--select_branch=best")
    assert (ao.max_spur_length, ao.select_branch) == (10000, "best")

    bo = BridgeOptions.from_string("--read2ctg_min_identity=85 "
                                   "--window_size=2000")
    assert (bo.min_ident, bo.end_window) == (85.0, 2000)


def test_fsa_bestn_changes_filter_output():
    """A config --bestn flag must actually change fsa_ol_filter output."""
    from necat_tpu.assembly.overlap_filter import FilterOptions, filter_overlaps
    rng = np.random.default_rng(0)
    n_reads, n_ovl = 12, 160
    qid = rng.integers(0, n_reads, n_ovl).astype(np.int32)
    sid = (qid + 1 + rng.integers(0, n_reads - 1, n_ovl)).astype(np.int32) % n_reads
    qsize = np.full(n_ovl, 10000, np.int32)
    # proper suffix->prefix dovetails (NOT containments: FilterContained
    # would otherwise drop everything regardless of bestn)
    qoff = rng.integers(4000, 6000, n_ovl).astype(np.int32)
    qend = (10000 - rng.integers(0, 50, n_ovl)).astype(np.int32)
    m4 = M4Records(
        qid=qid, sid=sid,
        ident=rng.uniform(85, 99, n_ovl).astype(np.float32),
        vscore=np.full(n_ovl, 100, np.int32),
        qdir=np.zeros(n_ovl, np.int8), qoff=qoff, qend=qend, qsize=qsize,
        sdir=np.zeros(n_ovl, np.int8),
        soff=rng.integers(0, 50, n_ovl).astype(np.int32),
        send=(qend - qoff).astype(np.int32),
        ssize=qsize.copy())
    base = FilterOptions(min_length=0, min_aligned_length=0, lack_of_support=False,
                         min_coverage=0, max_coverage=10**6,
                         max_diff_coverage=10**6)
    import dataclasses as dc
    r_all = filter_overlaps(m4, n_reads, dc.replace(base, bestn=100))
    r_one = filter_overlaps(m4, n_reads, dc.replace(base, bestn=1))
    assert len(r_one.m4) < len(r_all.m4)
