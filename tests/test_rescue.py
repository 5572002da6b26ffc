"""Wide-band long-indel rescue (the DALIGNER-cascade replacement).

Reference behavior: cns_extension (src/consensus/consensus_aux.c:123-215)
falls back to DALIGNER + full edlib when the blockwise aligner stops > 200 bp
short of the chain-predicted query range; asm_pm retries with a sensitive
aligner. Here the retry is the same banded kernel with a 4x wider band."""

import numpy as np
import pytest

from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.candidates import Candidates
from necat_tpu.overlap.overlapper import extend_candidates, rescue_hangs


def _pair_with_insert(ins_len: int, seed: int = 5):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, 6000).astype(np.uint8)
    ins = rng.integers(0, 4, ins_len).astype(np.uint8)
    q = np.concatenate([t[:3000], ins, t[3000:]]).astype(np.uint8)
    c = Candidates(qid=np.array([0]), sid=np.array([0]), qdir=np.zeros(1, np.int8),
                   score=np.array([100]), qbeg=np.array([100]),
                   qend=np.array([len(q) - 100]),
                   sbeg=np.array([100]), send=np.array([5900]),
                   qsize=np.array([len(q)]), ssize=np.array([len(t)]))
    return q, t, c


def test_rescue_crosses_long_insertion():
    q, t, c = _pair_with_insert(220)
    qs, ss = ReadStore.from_seqs([q]), ReadStore.from_seqs([t])
    m4_no = extend_candidates(c, qs, ss, band_width=128, rescue_long_indels=False)
    m4_yes = extend_candidates(c, qs, ss, band_width=128, rescue_long_indels=True)
    span_no = 0 if len(m4_no) == 0 else int(m4_no.qend[0] - m4_no.qoff[0])
    span_yes = int(m4_yes.qend[0] - m4_yes.qoff[0])
    assert span_no < 5500          # narrow band stops at the insertion
    assert span_yes > 5500         # wide-band retry crosses it
    assert len(m4_yes) == 1


def test_rescue_mask_triggers_only_on_hang():
    q, t, c = _pair_with_insert(220)
    qoff = np.array([100], np.int64)
    qend_short = np.array([3000], np.int64)   # stopped 3 kb early
    qend_full = np.array([len(q) - 100], np.int64)
    assert len(rescue_hangs(c, np.arange(1), qoff, qend_short)) == 1
    assert len(rescue_hangs(c, np.arange(1), qoff, qend_full)) == 0


def test_rescue_keeps_better_original():
    """A clean pair must be unchanged by enabling rescue."""
    rng = np.random.default_rng(7)
    t = rng.integers(0, 4, 4000).astype(np.uint8)
    q = t.copy()
    m = rng.random(4000) < 0.05
    q[m] = (q[m] + 1) % 4
    c = Candidates(qid=np.array([0]), sid=np.array([0]), qdir=np.zeros(1, np.int8),
                   score=np.array([100]), qbeg=np.array([50]), qend=np.array([3950]),
                   sbeg=np.array([50]), send=np.array([3950]),
                   qsize=np.array([4000]), ssize=np.array([4000]))
    qs, ss = ReadStore.from_seqs([q]), ReadStore.from_seqs([t])
    a = extend_candidates(c, qs, ss, rescue_long_indels=False)
    b = extend_candidates(c, qs, ss, rescue_long_indels=True)
    assert len(a) == len(b) == 1
    assert int(a.qoff[0]) == int(b.qoff[0]) and int(a.qend[0]) == int(b.qend[0])


def _short_pair_with_insert(ins_len: int, seed: int = 5):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, 3000).astype(np.uint8)
    ins = rng.integers(0, 4, ins_len).astype(np.uint8)
    q = np.concatenate([t[:1500], ins, t[1500:]]).astype(np.uint8)
    c = Candidates(qid=np.array([0]), sid=np.array([0]), qdir=np.zeros(1, np.int8),
                   score=np.array([100]), qbeg=np.array([100]),
                   qend=np.array([len(q) - 100]),
                   sbeg=np.array([100]), send=np.array([2900]),
                   qsize=np.array([len(q)]), ssize=np.array([len(t)]))
    return q, t, c


@pytest.mark.slow
@pytest.mark.parametrize("ins_len", [300, 500])
def test_rescue_ladder_crosses_very_long_insertion(ins_len):
    """Round-3 gap (VERDICT #4): a single 4x-band retry cannot cross indels
    beyond ~2x the widened band; the iterative band-doubling ladder must
    recover multi-hundred-bp planted insertions (the reference's unbounded
    DALIGNER wave territory, align.c:382 + consensus_aux.c:152-213). W0=64
    keeps the CPU ladder cheap; the ladder tops out at W=2048 whose W/4
    clamp admits a 512 bp diagonal shift."""
    q, t, c = _short_pair_with_insert(ins_len)
    qs, ss = ReadStore.from_seqs([q]), ReadStore.from_seqs([t])
    m4_one = extend_candidates(c, qs, ss, band_width=64,
                               rescue_long_indels=True,
                               rescue_band_max_scale=4)   # round-3 behavior
    m4_ladder = extend_candidates(c, qs, ss, band_width=64,
                                  rescue_long_indels=True)
    span_one = 0 if len(m4_one) == 0 else int(m4_one.qend[0] - m4_one.qoff[0])
    span_ladder = int(m4_ladder.qend[0] - m4_ladder.qoff[0])
    assert span_one < 2500 + ins_len, "4x retry should not cross this indel"
    assert span_ladder > 2500 + ins_len * 0.8, \
        f"ladder failed to cross a {ins_len} bp insertion"


@pytest.mark.slow
def test_consensus_rescue_smoke():
    """correct_reads with rescue_long_indels on runs end to end."""
    from necat_tpu.consensus.correct import correct_reads
    from necat_tpu.consensus.options import CnsOptions
    from necat_tpu.io.simulate import ErrorModel, random_genome, simulate_reads
    from necat_tpu.overlap.options import MapOptions
    from necat_tpu.overlap.overlapper import find_all_candidates

    genome = random_genome(12000, seed=2)
    reads, *_ = simulate_reads(genome, coverage=8, mean_len=5000, min_len=3000,
                               max_len=9000, em=ErrorModel(0.04, 0.04, 0.04), seed=3)
    store = ReadStore.from_seqs(reads)
    cands = find_all_candidates(store, store, MapOptions(), pairwise=True)
    call = Candidates.concat([cands, cands.swap_roles()])
    recs = correct_reads(store, call, CnsOptions(rescue_long_indels=True))
    assert any(r.corrected for r in recs)
