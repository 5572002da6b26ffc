import pytest
import numpy as np
import jax.numpy as jnp

from necat_tpu.align.banded import OP_DEL, OP_DIAG, OP_INS, OP_PAD
from necat_tpu.consensus import tags as tags_mod
from necat_tpu.consensus.backbone import call_consensus, compact_consensus
from necat_tpu.consensus.correct import (correct_reads, estimate_ident_cutoff,
                                         is_good_overlap, check_mapping_range)
from necat_tpu.consensus.options import CnsOptions
from necat_tpu.io import simulate
from necat_tpu.io.readstore import ReadStore
from necat_tpu.index.kmer_index import KmerIndex
from necat_tpu.overlap.candidates import Candidates, find_candidates_batch, top_n_per_query
from necat_tpu.overlap.options import MapOptions


def test_combined_ops():
    L = 8
    left = np.full((1, L), OP_PAD, np.uint8)
    right = np.full((1, L), OP_PAD, np.uint8)
    left[0, :3] = [OP_DIAG, OP_INS, OP_DIAG]   # reversed prefix order
    right[0, :2] = [OP_DIAG, OP_DEL]
    ops, n = tags_mod.combined_ops(jnp.asarray(left), jnp.asarray(np.array([3], np.int32)),
                                   jnp.asarray(right), jnp.asarray(np.array([2], np.int32)))
    ops, n = np.asarray(ops), np.asarray(n)
    assert n[0] == 5
    assert ops[0, :5].tolist() == [OP_DIAG, OP_INS, OP_DIAG, OP_DIAG, OP_DEL]


def test_scatter_tags_hand_case():
    # template row 0, template = ACGT, query aligns tpos 0..3:
    # ops: DIAG(A) DIAG(C) INS(G) DIAG(G) DEL
    TB, Lt, D = 1, 8, 4
    weights = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
    cov = jnp.zeros((TB + 1, Lt), jnp.int32)
    ops = np.full((1, 10), OP_PAD, np.uint8)
    ops[0, :5] = [OP_DIAG, OP_DIAG, OP_INS, OP_DIAG, OP_DEL]
    qb = np.zeros((1, 8), np.uint8)
    qb[0, :4] = [0, 1, 2, 2]  # A C G G
    w, c = tags_mod.scatter_tags(
        weights, cov, jnp.asarray(ops), jnp.asarray(np.array([5], np.int32)),
        jnp.asarray(qb), jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.array([0], np.int32)), jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(np.array([1.0], np.float32)), jnp.asarray(np.array([4], np.int32)))
    w, c = np.asarray(w), np.asarray(c)   # w[row, delta, base, t]
    assert w[0, 0, 0, 0] == 1.0          # t0 A
    assert w[0, 0, 1, 1] == 1.0          # t1 C
    assert w[0, 1, 2, 1] == 1.0          # insertion G after t1 (delta 1)
    assert w[0, 0, 2, 2] == 1.0          # t2 G
    assert w[0, 0, 4, 3] == 1.0          # t3 gap (deletion)
    np.testing.assert_array_equal(c[0, :4], [1, 1, 1, 1])
    assert c[0, 4:].sum() == 0


def test_call_consensus_majority():
    TB, L, D = 1, 6, 3
    w = np.zeros((TB, D, 5, L), np.float32)   # [row, delta, base, t]
    cov = np.zeros((TB, L), np.int32)
    cov[0, :5] = 6
    # t0: clear A
    w[0, 0, 0, 0] = 5.0
    # t1: gap wins (deletion)
    w[0, 0, 4, 1] = 4.0; w[0, 0, 1, 1] = 2.0
    # t2: C, plus strong insertion T (delta1) weight 4 >= 0.35*6 + 1
    w[0, 0, 1, 2] = 5.0; w[0, 1, 3, 2] = 4.0
    # t3: G, weak insertion (1.0 < threshold) ignored
    w[0, 0, 2, 3] = 5.0; w[0, 1, 0, 3] = 1.0
    # t4: T
    w[0, 0, 3, 4] = 6.0
    # t5: uncovered
    emit, base = call_consensus(jnp.asarray(w), jnp.asarray(cov), 4, 0.35)
    emit, base = np.asarray(emit), np.asarray(base)
    seq = base[0][emit[0]]
    assert seq.tolist() == [0, 1, 3, 2, 3]  # A C T(ins) G T ; t1 deleted; t5 uncovered


def test_compact_consensus_intervals():
    TB, L, D = 1, 3000, 2
    emit = np.zeros((TB, L, D), bool)
    base = np.zeros((TB, L, D), np.uint8)
    cov = np.zeros((TB, L), np.int32)
    cov[0, 100:800] = 5      # 700 >= min_size
    cov[0, 2500:2900] = 5    # 400 < min_size -> dropped
    emit[0, :, 0] = True
    base[0, :, 0] = 2
    tmpl = np.ones((TB, L), np.uint8)
    out = compact_consensus(emit, base, cov, np.array([3000]), tmpl,
                            min_cov=4, min_size=500, raw_min_gap=1000)
    cns, raw = out[0]
    assert len(cns) == 1
    s, e, seq = cns[0]
    assert (s, e) == (100, 800)
    assert len(seq) == 700 and np.all(seq == 2)
    # raw: [0,100) too small; [800,3000) >= 1000 -> raw passthrough
    assert len(raw) == 1
    rs_, re_, rseq = raw[0]
    assert (rs_, re_) == (800, 3000)
    assert np.all(rseq == 1)


def test_estimate_ident_cutoff():
    assert estimate_ident_cutoff(np.array([])) == 0.0
    assert estimate_ident_cutoff(np.array([90.0, 91, 92])) == 0.0  # n<5
    idents = np.array([88, 89, 90, 91, 92, 93, 94, 95, 96, 97], float)
    c = estimate_ident_cutoff(idents)
    top = np.sort(idents)[::-1][:7]
    assert abs(c - (top.mean() - 5 * top.std())) < 1e-9


def test_helper_predicates():
    assert is_good_overlap(10, 4900, 5000, 100, 5000, 8000)   # q fully covered
    assert not is_good_overlap(1000, 4000, 5000, 1000, 4000, 8000)
    assert check_mapping_range(0, 500, 5000, 0, 500, 5000, 400, 0.8)
    assert not check_mapping_range(0, 300, 5000, 0, 300, 5000, 400, 0.8)


@pytest.mark.slow
def test_correction_end_to_end_small():
    G = 30000
    genome = simulate.random_genome(G, seed=21)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=8, mean_len=5000, min_len=3000, max_len=7000, seed=3)
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
    recs = correct_reads(rs, call, CnsOptions(templates_per_batch=8, pairs_per_chunk=32))
    corrected = [r for r in recs if r.corrected]
    assert len(corrected) >= rs.n_reads * 0.5

    idents = []
    for r in corrected[:12]:
        i = r.tid
        frac_l, frac_r = r.left / len(reads[i]), r.right / len(reads[i])
        s0, L0 = int(st[i]), int(ln[i])
        if sd[i] == 0:
            a, b = s0 + int(frac_l * L0), s0 + int(frac_r * L0)
        else:
            a, b = s0 + int((1 - frac_r) * L0), s0 + int((1 - frac_l) * L0)
        if b - a < 500:
            continue
        seq = r.seq if sd[i] == 0 else (3 - r.seq[::-1]).astype(np.uint8)
        idents.append(simulate.identity_to_genome(seq, genome, a, 0, b - a))
    assert len(idents) >= 5
    assert np.mean(idents) >= 93.0, f"mean corrected identity {np.mean(idents):.2f}"


def test_scatter_pass_cols_matches_scatter_pass():
    """The per-column scatter must reproduce the op-string scatter exactly
    (both directions), given the same clipped alignments."""
    from necat_tpu.align.banded import (banded_forward, banded_traceback,
                                        clip_tail, cols_clip_stats, ops_to_cols)

    rng = np.random.default_rng(3)
    em = simulate.ErrorModel(sub=0.05, ins=0.06, dele=0.05)
    P, L, W, D = 4, 512, 64, 8
    TB, Lt = 2, 600
    a = np.zeros((P, L), np.uint8)
    b = np.zeros((P, L), np.uint8)
    la = np.zeros(P, np.int32)
    lb = np.zeros(P, np.int32)
    for i in range(P):
        t = rng.integers(0, 4, int(rng.integers(250, 480))).astype(np.uint8)
        q = simulate.mutate(t, em, rng)[:L]
        a[i, :len(q)] = q; la[i] = len(q)
        b[i, :len(t)] = t; lb[i] = len(t)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    dirs, offs, _, _ = banded_forward(aj, bj, jnp.asarray(la), jnp.asarray(lb), W, max_cols=L)
    ops, n_ops = banded_traceback(dirs, offs, jnp.asarray(la), jnp.asarray(lb), 2 * L)
    n_clip, _ = clip_tail(ops, n_ops, aj, bj)
    cols, insb_words, lead = ops_to_cols(ops, n_ops, aj, bj, MC=L)
    insb = insb_words[0]
    st = cols_clip_stats(cols, lead, aj, bj)

    pair_row = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
    pair_w = jnp.asarray(np.array([1.0, 0.5, 0.75, 0.25], np.float32))
    tsize = jnp.full((P,), Lt, jnp.int32)
    # for the reversed case the scatter's qbatch must be the ORIGINAL-orientation
    # view of the extension-order `a` (extend_batch's _gather_rev_prefix invariant:
    # qbatch[aq-1-p] == a[p]); reusing `a` directly would be inconsistent
    a_orig = np.zeros_like(a)
    for i in range(P):
        a_orig[i, :la[i]] = a[i, :la[i]][::-1]
    for reversed_part, qb_np, aq_np, at_np in [
            (False, a, np.zeros(P, np.int32), np.full(P, 3, np.int32)),
            (True, a_orig, la.copy(), lb.copy() + 3)]:
        qbj = jnp.asarray(qb_np)
        aq, at = jnp.asarray(aq_np), jnp.asarray(at_np)
        w0 = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
        c0 = jnp.zeros((TB + 1, Lt), jnp.int32)
        w_old, c_old = tags_mod.scatter_pass(
            w0, c0, ops, n_clip, qbj, aq, at, pair_row, pair_w, tsize,
            reversed_part=reversed_part)
        w_new, c_new = tags_mod.scatter_pass_cols(
            w0, c0, cols, lead, st["jc"], qbj, aq, at, pair_row, pair_w, tsize,
            reversed_part=reversed_part)
        np.testing.assert_array_equal(np.asarray(c_old), np.asarray(c_new))
        np.testing.assert_allclose(np.asarray(w_old), np.asarray(w_new),
                                   rtol=0, atol=1e-6)
        # MXU (one-hot matmul) formulation must match the scatter exactly
        lead_np = np.asarray(lead)
        leadb = np.zeros((P, tags_mod.N_INSB), np.uint8)
        for d in range(1, tags_mod.N_INSB + 1):
            src = (d - 1) if not reversed_part else np.clip(lead_np - d, 0, L - 1)
            leadb[:, d - 1] = a[np.arange(P), src]
        w_mm, c_mm = tags_mod.scatter_pass_cols_mm(
            w0, c0, tags_mod.pad_cols_to(cols, Lt, 3),
            tags_mod.pad_cols_to(insb, Lt, 0), lead, jnp.asarray(leadb),
            st["jc"], at, pair_row, pair_w, tsize,
            reversed_part=reversed_part)
        np.testing.assert_array_equal(np.asarray(c_old), np.asarray(c_mm))
        np.testing.assert_allclose(np.asarray(w_old), np.asarray(w_mm),
                                   rtol=0, atol=1e-5)


def test_consensus_packed_matches_dense_compaction():
    rng = np.random.default_rng(11)
    TB, L, D = 4, 256, 8
    w = rng.random((TB, D, 5, L)).astype(np.float32) * 3
    cov = rng.integers(0, 12, (TB, L)).astype(np.int32)
    tlens = np.array([256, 200, 128, 0], np.int32)
    templates = rng.integers(0, 4, (TB, L)).astype(np.uint8)
    from necat_tpu.consensus.backbone import (compact_consensus,
                                              compact_from_packed,
                                              consensus_packed)
    emit, base = call_consensus(jnp.asarray(w), jnp.asarray(cov), 4, 0.3, 1.0)
    dense = compact_consensus(np.asarray(emit), np.asarray(base), cov,
                              tlens, templates, 4, 20, 50)
    packed = consensus_packed(jnp.asarray(w), jnp.asarray(cov), 4, 0.3, 1.0)
    fast = compact_from_packed(np.asarray(packed), tlens, templates, 20, 50,
                               max_delta=D)
    assert len(dense) == len(fast)
    for (dc, dr), (fc, fr) in zip(dense, fast):
        assert len(dc) == len(fc) and len(dr) == len(fr)
        for (s1, e1, q1), (s2, e2, q2) in zip(dc + dr, fc + fr):
            assert (s1, e1) == (s2, e2)
            np.testing.assert_array_equal(q1, q2)


def test_consensus_stream_matches_dense_compaction():
    rng = np.random.default_rng(9)
    TB, L, D = 4, 256, 8
    w = rng.random((TB, D, 5, L)).astype(np.float32) * 3
    cov = rng.integers(0, 12, (TB, L)).astype(np.int32)
    tlens = np.array([256, 200, 128, 0], np.int32)
    templates = rng.integers(0, 4, (TB, L)).astype(np.uint8)
    from necat_tpu.consensus.backbone import (compact_consensus, compact_from_stream,
                                              consensus_stream)
    emit, base = call_consensus(jnp.asarray(w), jnp.asarray(cov), 4, 0.3, 1.0)
    dense = compact_consensus(np.asarray(emit), np.asarray(base), cov,
                              tlens, templates, 4, 20, 50)
    SL = L + max(1024, L // 8)
    stream, cum_t, n_emit, cov8 = consensus_stream(jnp.asarray(w), jnp.asarray(cov),
                                                   4, 0.3, 1.0, SL=SL)
    assert not np.any(np.asarray(n_emit) > SL)
    fast = compact_from_stream(np.asarray(stream), np.asarray(cum_t), np.asarray(cov8),
                               tlens, templates, 4, 20, 50)
    assert len(dense) == len(fast)
    for (dc, dr), (fc, fr) in zip(dense, fast):
        assert len(dc) == len(fc) and len(dr) == len(fr)
        for (s1, e1, q1), (s2, e2, q2) in zip(dc, fc):
            assert (s1, e1) == (s2, e2)
            np.testing.assert_array_equal(q1, q2)
        for (s1, e1, q1), (s2, e2, q2) in zip(dr, fr):
            assert (s1, e1) == (s2, e2)
            np.testing.assert_array_equal(q1, q2)


@pytest.mark.nightly
@pytest.mark.slow
def test_full_consensus_stitches_whole_read():
    """-f 1 (consensus_unbroken, cbcns.c:171-252): one whole output read with
    consensus fragments joined by raw template gaps."""
    G = 30000
    genome = simulate.random_genome(G, seed=5)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=8, mean_len=5000, min_len=3000, max_len=7000, seed=11)
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
    recs = correct_reads(rs, call,
                         CnsOptions(templates_per_batch=8, pairs_per_chunk=64,
                                    full_consensus=True))
    by_tid = {}
    for r in recs:
        by_tid.setdefault(r.tid, []).append(r)
    # every read yields exactly ONE whole-length record
    for tid, rr in by_tid.items():
        assert len(rr) == 1, f"read {tid}: {len(rr)} records under -f 1"
        assert rr[0].left == 0 and rr[0].right == rr[0].org_size
    assert sum(1 for r in recs if r.corrected) >= rs.n_reads * 0.5


@pytest.mark.slow
def test_mm_scatter_wide_delta_matches_oracle():
    """words=3 insb channels (the polish u16-delta capacity): the MXU scatter
    must reproduce the query-axis oracle for insertion runs longer than 7."""
    from necat_tpu.align.banded import extend_batch

    rng = np.random.default_rng(13)
    P, L, W, D = 8, 512, 64, 22
    TB, Lt = 2, 640
    em = simulate.ErrorModel(sub=0.03, ins=0.02, dele=0.02)
    a = np.zeros((P, L), np.uint8)
    b = np.zeros((P, L), np.uint8)
    la = np.zeros(P, np.int32)
    lb = np.zeros(P, np.int32)
    for i in range(P):
        t = rng.integers(0, 4, 400).astype(np.uint8)
        q = simulate.mutate(t, em, rng)
        # plant a 12-20 bp insertion mid-read
        ins = rng.integers(0, 4, int(rng.integers(12, 21))).astype(np.uint8)
        cut = int(rng.integers(100, 300))
        q = np.concatenate([q[:cut], ins, q[cut:]])[:L]
        a[i, :len(q)] = q; la[i] = len(q)
        b[i, :len(t)] = t; lb[i] = len(t)
    aq = (la // 3).astype(np.int32)
    at = (la // 3).astype(np.int32)  # rough anchor; extension finds the path
    res = extend_batch(jnp.asarray(a), jnp.asarray(la), jnp.asarray(b),
                       jnp.asarray(lb), jnp.asarray(aq), jnp.asarray(at),
                       W=W, insb_words=3)
    pair_row = jnp.asarray(np.array([0, 1] * (P // 2), np.int32))
    pair_w = jnp.asarray(rng.random(P).astype(np.float32) + 0.5)
    tsize = jnp.full((P,), Lt, jnp.int32)
    w0 = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
    c0 = jnp.zeros((TB + 1, Lt), jnp.int32)
    args = (res.qbatch if hasattr(res, "qbatch") else jnp.asarray(a),
            jnp.asarray(aq), jnp.asarray(at), pair_row, pair_w, tsize)
    w_or, c_or = tags_mod.scatter_pass_cols(
        w0, c0, res.right_cols, res.right_lead, res.right_jc, *args,
        reversed_part=False)
    w_or, c_or = tags_mod.scatter_pass_cols(
        w_or, c_or, res.left_cols, res.left_lead, res.left_jc, *args,
        reversed_part=True)
    w_mm, c_mm = tags_mod.scatter_chunk_mm(
        w0, c0,
        tags_mod.pad_cols_to(res.left_cols, Lt, 3),
        tuple(tags_mod.pad_cols_to(x, Lt, 0)
              for x in (res.left_insb, res.left_insb2, res.left_insb3)),
        res.left_lead, res.left_leadb, res.left_jc,
        tags_mod.pad_cols_to(res.right_cols, Lt, 3),
        tuple(tags_mod.pad_cols_to(x, Lt, 0)
              for x in (res.right_insb, res.right_insb2, res.right_insb3)),
        res.right_lead, res.right_leadb, res.right_jc,
        jnp.asarray(at), pair_row, pair_w, tsize)
    np.testing.assert_array_equal(np.asarray(c_or), np.asarray(c_mm))
    np.testing.assert_allclose(np.asarray(w_or), np.asarray(w_mm),
                               rtol=0, atol=1e-5)


@pytest.mark.nightly
@pytest.mark.slow
def test_small_memory_mode_matches_default():
    """SMALL_MEMORY (oc2cns -s): per-supergroup device stores must produce
    byte-identical corrected output."""
    G = 14000
    genome = simulate.random_genome(G, seed=33)
    reads, *_ = simulate.simulate_reads(
        genome, coverage=6, mean_len=4000, min_len=3000, max_len=5500, seed=34)
    rs = ReadStore.from_seqs(reads)
    idx = KmerIndex.build(rs.bases, rs.offsets, k=13, occ_cutoff=500)
    opts = MapOptions(kmer_size=13, max_hits=1 << 18, max_pairs=4096)
    sub_off = jnp.asarray(rs.offsets.astype(np.int32))
    parts = []
    for qdir in (0, 1):
        batch, lens = rs.padded_batch(np.arange(rs.n_reads), rc=bool(qdir))
        parts.append(find_candidates_batch(idx, sub_off, 0, batch, lens,
                     np.arange(rs.n_reads, dtype=np.int32), qdir,
                     rs.lengths.astype(np.int32), opts, pairwise=True))
    c = top_n_per_query(Candidates.concat(parts), 500)
    call = Candidates.concat([c, c.swap_roles()])
    co = CnsOptions(templates_per_batch=4, pairs_per_chunk=32,
                    buckets_per_supergroup=2)
    recs_a = correct_reads(rs, call, co)
    recs_b = correct_reads(rs, call, dataclasses_replace(co, small_memory=True))
    assert len(recs_a) == len(recs_b)
    for a, b in zip(recs_a, recs_b):
        assert (a.tid, a.left, a.right, a.corrected) == (b.tid, b.left, b.right, b.corrected)
        np.testing.assert_array_equal(a.seq, b.seq)


from dataclasses import replace as dataclasses_replace  # noqa: E402


def _small_call(G=12000, gseed=33, rseed=34, coverage=6):
    genome = simulate.random_genome(G, seed=gseed)
    reads, *_ = simulate.simulate_reads(
        genome, coverage=coverage, mean_len=4000, min_len=3000, max_len=5500,
        seed=rseed)
    rs = ReadStore.from_seqs(reads)
    idx = KmerIndex.build(rs.bases, rs.offsets, k=13, occ_cutoff=500)
    opts = MapOptions(kmer_size=13, max_hits=1 << 18, max_pairs=4096)
    sub_off = jnp.asarray(rs.offsets.astype(np.int32))
    parts = []
    for qdir in (0, 1):
        batch, lens = rs.padded_batch(np.arange(rs.n_reads), rc=bool(qdir))
        parts.append(find_candidates_batch(idx, sub_off, 0, batch, lens,
                     np.arange(rs.n_reads, dtype=np.int32), qdir,
                     rs.lengths.astype(np.int32), opts, pairwise=True))
    c = top_n_per_query(Candidates.concat(parts), 500)
    return rs, Candidates.concat([c, c.swap_roles()])


def _assert_same_records(recs_a, recs_b):
    assert len(recs_a) == len(recs_b)
    for a, b in zip(recs_a, recs_b):
        assert (a.tid, a.left, a.right, a.corrected) == \
            (b.tid, b.left, b.right, b.corrected)
        np.testing.assert_array_equal(a.seq, b.seq)


@pytest.mark.nightly
@pytest.mark.slow
def test_fused_matches_legacy():
    """The fused single-dispatch path (consensus/fused.py) must produce
    records identical to the legacy two-program oracle flow."""
    rs, call = _small_call()
    co = CnsOptions(templates_per_batch=4, pairs_per_chunk=32,
                    buckets_per_supergroup=2)
    recs_a = correct_reads(rs, call, dataclasses_replace(co, fused=False))
    recs_b = correct_reads(rs, call, dataclasses_replace(co, fused=True))
    assert any(r.corrected for r in recs_a)
    _assert_same_records(recs_a, recs_b)


@pytest.mark.nightly
@pytest.mark.slow
def test_fused_matches_legacy_rescue():
    """Same equality with the long-indel rescue cascade enabled (the fused
    path runs it by deferral + replay; consensus_aux.c:152-213)."""
    rs, call = _small_call(gseed=55, rseed=56)
    co = CnsOptions(templates_per_batch=4, pairs_per_chunk=32,
                    buckets_per_supergroup=2, rescue_long_indels=True,
                    rescue_band_max_scale=8)   # equality, not ladder depth
    recs_a = correct_reads(rs, call, dataclasses_replace(co, fused=False))
    recs_b = correct_reads(rs, call, dataclasses_replace(co, fused=True))
    assert any(r.corrected for r in recs_a)
    _assert_same_records(recs_a, recs_b)


@pytest.mark.slow
def test_fused_matches_legacy_fixed_cutoff():
    """Fixed-cutoff mode (-u 1) skips round 0 entirely in both paths."""
    rs, call = _small_call(gseed=77, rseed=78)
    co = CnsOptions(templates_per_batch=4, pairs_per_chunk=32,
                    buckets_per_supergroup=2, use_fixed_ident_cutoff=True,
                    error=0.3)
    recs_a = correct_reads(rs, call, dataclasses_replace(co, fused=False))
    recs_b = correct_reads(rs, call, dataclasses_replace(co, fused=True))
    _assert_same_records(recs_a, recs_b)


@pytest.mark.slow
def test_multidevice_correction_matches_single(monkeypatch):
    """Bucket-parallel correction over several devices (fused path routes
    bucket b to device b % n) must reproduce single-device records exactly."""
    import jax
    if jax.local_device_count() < 2:
        import pytest
        pytest.skip("needs multiple (virtual) devices")
    rs, call = _small_call(gseed=101, rseed=102)
    co = CnsOptions(templates_per_batch=4, pairs_per_chunk=32,
                    buckets_per_supergroup=2)
    monkeypatch.setenv("NECAT_TPU_CNS_DEVICES", "1")
    recs_a = correct_reads(rs, call, co)
    monkeypatch.setenv("NECAT_TPU_CNS_DEVICES", "2")
    recs_b = correct_reads(rs, call, co)
    assert any(r.corrected for r in recs_a)
    _assert_same_records(recs_a, recs_b)
