import pytest
"""Multi-host launcher tests (parallel/launcher.py).

Real multi-controller runs need multiple processes; here we verify the pieces
that make them correct: stripe partitioning (the `-mn node_id num_nodes` role,
reference src/consensus/main.c:71-73) and the stripe-union property of
correct_reads (per-host outputs must union to exactly the single-host output,
matching the reference's per-node cns files merged by oc2ReorderCnsReads).
"""

import numpy as np
import jax.numpy as jnp

from necat_tpu.consensus.correct import correct_reads
from necat_tpu.consensus.options import CnsOptions
from necat_tpu.index.kmer_index import KmerIndex
from necat_tpu.io import simulate
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.candidates import Candidates, find_candidates_batch, top_n_per_query
from necat_tpu.overlap.options import MapOptions
from necat_tpu.parallel import launcher


def test_host_stripe_partitions_evenly():
    n_items = 101
    parts = [launcher.host_stripe(n_items, p, 4) for p in range(4)]
    allids = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allids, np.arange(n_items))
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1          # even split
    np.testing.assert_array_equal(parts[1], np.arange(1, n_items, 4))  # strided


def test_init_multihost_single_process(monkeypatch):
    monkeypatch.delenv("NECAT_TPU_COORDINATOR", raising=False)
    assert launcher.init_multihost() == (0, 1)
    assert launcher.is_coordinator()
    launcher.barrier("noop")                      # single-process no-op


@pytest.mark.nightly
@pytest.mark.slow
def test_correct_reads_stripe_union_matches_full():
    genome = simulate.random_genome(12000, seed=5)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=6, mean_len=3500, min_len=2500, max_len=5000, seed=11)
    rs = ReadStore.from_seqs(reads)
    idx = KmerIndex.build(rs.bases, rs.offsets, k=13, occ_cutoff=500)
    opts = MapOptions(kmer_size=13, max_hits=1 << 19, max_pairs=4096)
    sub_off = jnp.asarray(rs.offsets.astype(np.int32))
    parts = []
    for qdir in (0, 1):
        batch, lens = rs.padded_batch(np.arange(rs.n_reads), rc=bool(qdir))
        parts.append(find_candidates_batch(idx, sub_off, 0, batch, lens,
                     np.arange(rs.n_reads, dtype=np.int32), qdir,
                     rs.lengths.astype(np.int32), opts, pairwise=True))
    c = top_n_per_query(Candidates.concat(parts), 500)
    call = Candidates.concat([c, c.swap_roles()])
    copts = CnsOptions(templates_per_batch=8, pairs_per_chunk=32)

    def by_tid(recs):
        out = {}
        for r in recs:                            # a template may split into
            out.setdefault(r.tid, []).append(r)   # several records (min_size)
        return out

    full = by_tid(correct_reads(rs, call, copts))
    merged = {}
    for p in range(3):
        stripe = launcher.host_stripe(rs.n_reads, p, 3)
        part = by_tid(correct_reads(rs, call, copts, template_ids=stripe))
        assert not (set(part) & set(merged))      # stripes are disjoint
        merged.update(part)
    assert set(merged) == set(full)
    for tid, recs in full.items():
        assert len(merged[tid]) == len(recs)
        for a, b in zip(sorted(recs, key=lambda r: r.left),
                        sorted(merged[tid], key=lambda r: r.left)):
            np.testing.assert_array_equal(a.seq, b.seq)
            assert a.corrected == b.corrected
