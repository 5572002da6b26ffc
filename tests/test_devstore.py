"""DeviceReadStore on-device batch gather vs the host padded_batch oracle."""

import numpy as np

from necat_tpu.io.devstore import DeviceReadStore
from necat_tpu.io.readstore import ReadStore
from necat_tpu.io import seqio


def _random_store(rng, n=37, lo=50, hi=5000):
    seqs = [rng.integers(0, 4, rng.integers(lo, hi), dtype=np.uint8)
            for _ in range(n)]
    return ReadStore.from_seqs(seqs)


def test_gather_matches_host_padded_batch():
    rng = np.random.default_rng(3)
    store = _random_store(rng)
    dev = DeviceReadStore(store)
    L = 6144
    ids = rng.integers(0, store.n_reads, 24)
    rc = rng.random(24) < 0.5
    got = np.asarray(dev.read_rows(ids, rc, L))
    for k, (i, r) in enumerate(zip(ids, rc)):
        s = store.get(int(i), rc=bool(r))
        assert np.array_equal(got[k, :len(s)], s), f"row {k} id {i} rc {r}"
        assert not got[k, len(s):].any()


def test_gather_windows():
    rng = np.random.default_rng(4)
    store = _random_store(rng, n=9, lo=3000, hi=20000)
    dev = DeviceReadStore(store)
    L = 8192
    ids = rng.integers(0, store.n_reads, 16)
    ws = np.array([rng.integers(0, max(1, store.lengths[i] - 100)) for i in ids])
    we = np.array([rng.integers(w + 1, store.lengths[i] + 1)
                   for i, w in zip(ids, ws)])
    gstart = store.offsets[ids] + ws
    glen = np.minimum(we - ws, L)
    got = np.asarray(dev.gather(gstart, glen, np.zeros(16, bool), L))
    for k, (i, w) in enumerate(zip(ids, ws)):
        seg = store.get(int(i))[w:w + glen[k]]
        assert np.array_equal(got[k, :len(seg)], seg)
        assert not got[k, len(seg):].any()


def test_gather_rc_equals_revcomp():
    rng = np.random.default_rng(5)
    store = _random_store(rng, n=5, lo=10, hi=64)
    dev = DeviceReadStore(store)
    ids = np.arange(store.n_reads)
    got = np.asarray(dev.read_rows(ids, np.ones(len(ids), bool), 2048))
    for i in ids:
        s = seqio.revcomp(store.get(int(i)))
        assert np.array_equal(got[i, :len(s)], s)
