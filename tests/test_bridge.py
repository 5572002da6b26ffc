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
