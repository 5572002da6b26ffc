"""Chip-mesh sharding must be an implementation detail: the sharded overlap
pipeline (subject-sharded candidates via shard_map + pair-sharded extension)
must produce the same results as the single-device path on the same seeds.

Runs on the 8-virtual-CPU-device mesh (conftest). This is the chip-level
equivalent of the reference's per-volume thread groups (pm_worker.c:283-335);
the host-level stripe-union equivalence lives in test_launcher.py.
"""

import numpy as np
import jax
import pytest

from necat_tpu.io import simulate
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.options import MapOptions
from necat_tpu.overlap.overlapper import (extend_candidates,
                                          find_all_candidates,
                                          overlap_all_vs_all)
from necat_tpu.parallel import mesh as pmesh


def _dataset(seed=17, G=20000, coverage=8):
    genome = simulate.random_genome(G, seed=seed)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=coverage, mean_len=4000, min_len=2500, max_len=6000,
        seed=seed + 1)
    return ReadStore.from_seqs(reads)


def _cand_set(c):
    return sorted(zip(c.qid.tolist(), c.sid.tolist(), c.qdir.tolist(),
                      c.score.tolist(), c.qbeg.tolist(), c.qend.tolist(),
                      c.sbeg.tolist(), c.send.tolist()))


OPTS = MapOptions(kmer_size=13, max_hits=1 << 17, max_pairs=4096,
                  chain_min_score=20, align_size_cutoff=300)


@pytest.mark.slow
def test_sharded_candidates_match_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide the virtual mesh"
    rs = _dataset()
    mesh = pmesh.make_mesh(8)
    sharded = find_all_candidates(rs, rs, OPTS, pairwise=True, mesh=mesh)
    # force the single-device path by building the index explicitly
    from necat_tpu.index.kmer_index import KmerIndex
    idx = KmerIndex.build(rs.bases, rs.offsets, k=13, occ_cutoff=500)
    single = find_all_candidates(rs, rs, OPTS, pairwise=True, index=idx)
    assert len(sharded) > 0
    assert _cand_set(sharded) == _cand_set(single)


@pytest.mark.slow
def test_sharded_extension_matches_single_device():
    rs = _dataset(seed=23)
    from necat_tpu.index.kmer_index import KmerIndex
    idx = KmerIndex.build(rs.bases, rs.offsets, k=13, occ_cutoff=500)
    cands = find_all_candidates(rs, rs, OPTS, pairwise=True, index=idx)
    assert len(cands) > 0

    import necat_tpu.align.engine as engine_mod

    mesh = pmesh.make_mesh(8)
    m4_sharded = extend_candidates(cands, rs, rs, min_align_size=300,
                                   band_width=64)

    # force single-device by monkeypatching auto_mesh
    orig = pmesh.auto_mesh
    pmesh.auto_mesh = lambda: None
    try:
        m4_single = extend_candidates(cands, rs, rs, min_align_size=300,
                                      band_width=64)
    finally:
        pmesh.auto_mesh = orig

    assert len(m4_sharded) == len(m4_single)
    for f in ("qid", "sid", "qoff", "qend", "soff", "send"):
        np.testing.assert_array_equal(getattr(m4_sharded, f),
                                      getattr(m4_single, f))
    np.testing.assert_allclose(m4_sharded.ident, m4_single.ident, atol=1e-6)


@pytest.mark.slow
def test_overlap_all_vs_all_stage_on_mesh():
    """The ACTUAL stage function on the mesh equals the single-device run."""
    rs = _dataset(seed=31)
    sharded = overlap_all_vs_all(rs, OPTS, min_align_size=300, band_width=64)
    orig = pmesh.auto_mesh
    pmesh.auto_mesh = lambda: None
    try:
        single = overlap_all_vs_all(rs, OPTS, min_align_size=300, band_width=64)
    finally:
        pmesh.auto_mesh = orig
    key = lambda m: sorted(zip(m.qid.tolist(), m.sid.tolist(),
                               m.qoff.tolist(), m.qend.tolist(),
                               m.soff.tolist(), m.send.tolist()))
    assert len(sharded) > 0
    assert key(sharded) == key(single)
