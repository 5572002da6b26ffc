"""Pin the production consensus (thresholded weighted majority,
backbone.call_consensus) against a faithful Python port of the reference's
link DP (consensus_backbone_segment, src/tasc/cns_aux.c:127-217): identical
alignments go to both; the emitted sequences must agree to within a small
divergence AND both must recover the true template.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from necat_tpu.align.banded import (banded_forward, banded_traceback,
                                    clip_tail, ops_to_cols, OP_DIAG, OP_DEL,
                                    OP_INS, OP_PAD)
from necat_tpu.consensus import tags as tags_mod
from necat_tpu.consensus.backbone import call_consensus
from necat_tpu.consensus.linkdp import consensus_linkdp, tags_from_ops, GAP
from necat_tpu.io import simulate


def test_tags_from_ops_hand_case():
    # template ACGT; query A C +G G -; ops DIAG DIAG INS DIAG DEL
    ops = np.array([OP_DIAG, OP_DIAG, OP_INS, OP_DIAG, OP_DEL], np.uint8)
    q = np.array([0, 1, 2, 2], np.uint8)
    tags = tags_from_ops(ops, 5, q, qoff=0, toff=0, weight=1.0)
    # (t, d, b, pt, pd, pb, w)
    assert tags[0] == (0, 0, 0, -1, 0, GAP, 1.0)
    assert tags[1] == (1, 0, 1, 0, 0, 0, 1.0)
    assert tags[2] == (1, 1, 2, 1, 0, 1, 1.0)   # insertion after t1
    assert tags[3] == (2, 0, 2, 1, 1, 2, 1.0)
    assert tags[4] == (3, 0, GAP, 2, 0, 2, 1.0)


@pytest.mark.slow
def test_linkdp_recovers_template_and_matches_majority():
    rng = np.random.default_rng(5)
    G = 1500
    template = simulate.random_genome(G, seed=8)
    em = simulate.ErrorModel(sub=0.05, ins=0.05, dele=0.05)
    n_reads, W, D = 14, 64, 8
    L = 2048
    a = np.zeros((n_reads, L), np.uint8)
    la = np.zeros(n_reads, np.int32)
    for i in range(n_reads):
        q = simulate.mutate(template, em, rng)
        a[i, :len(q)] = q[:L]
        la[i] = min(len(q), L)
    b = np.zeros((n_reads, L), np.uint8)
    b[:, :G] = template
    lb = np.full(n_reads, G, np.int32)

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    laj, lbj = jnp.asarray(la), jnp.asarray(lb)
    dirs, offs, _, _ = banded_forward(aj, bj, laj, lbj, W, max_cols=L)
    ops, n_ops = banded_traceback(dirs, offs, laj, lbj, max_ops=2 * L)
    n_clip, _ = clip_tail(ops, n_ops, aj, bj)
    ops_np, n_np = np.asarray(ops), np.asarray(n_clip)

    # --- reference link DP over the exact same alignments
    all_tags = []
    for i in range(n_reads):
        t = tags_from_ops(ops_np[i], int(n_np[i]), a[i], qoff=0, toff=0,
                          weight=1.0)
        assert t is not None
        all_tags.extend(t)
    seq_dp, f, to = consensus_linkdp(all_tags, G)

    # --- production path: dense scatter + majority call
    Lt = 2048
    cols, insb, lead = ops_to_cols(ops, n_clip, aj, bj, MC=L)
    from necat_tpu.align.banded import cols_clip_stats
    st = cols_clip_stats(cols, lead, aj, bj)
    w0 = jnp.zeros((2, D, 5, Lt), jnp.float32)
    c0 = jnp.zeros((2, Lt), jnp.int32)
    w, c = tags_mod.scatter_pass_cols(
        w0, c0, cols, lead, st["jc"],
        aj, jnp.zeros(n_reads, jnp.int32), jnp.zeros(n_reads, jnp.int32),
        jnp.zeros(n_reads, jnp.int32), jnp.ones(n_reads, jnp.float32),
        jnp.full(n_reads, G, jnp.int32), reversed_part=False)
    emit, base = call_consensus(w[:1], c[:1], 4, 0.2, 1.0)
    emit, base = np.asarray(emit), np.asarray(base)
    seq_mv = base[0][emit[0]]

    ident_dp = simulate.identity_to_genome(seq_dp, template, 0, 0, G)
    ident_mv = simulate.identity_to_genome(seq_mv, template, 0, 0, G)
    # both recover the template at 14x coverage
    assert ident_dp >= 99.0, f"link DP identity {ident_dp}"
    assert ident_mv >= 99.0, f"majority identity {ident_mv}"
    # and agree with each other (divergence quantified: the majority call is
    # the order-preserving approximation of the link DP)
    agree = simulate.identity_to_genome(seq_mv, seq_dp, 0, 0, len(seq_dp))
    assert agree >= 99.0, f"majority vs link-DP agreement {agree}"


def test_banded_host_edit_ops_matches_full():
    """The banded host DP (hotspot windows beyond the old 4 kb cap,
    VERDICT r3 #10) must reproduce the full-matrix alignment for
    diagonal-hugging inputs."""
    import numpy as np

    from necat_tpu.consensus.linkdp import _host_edit_ops_banded, host_edit_ops
    from necat_tpu.io import simulate

    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 3000).astype(np.uint8)
    em = simulate.ErrorModel(0.04, 0.04, 0.04)
    q = simulate.mutate(t, em, rng)
    ops_f, qs_f, qe_f = host_edit_ops(q, t, band=1 << 30)   # force full DP
    ops_b, qs_b, qe_b = _host_edit_ops_banded(q, t, band=300)
    assert (qs_f, qe_f) == (qs_b, qe_b)
    assert np.array_equal(ops_f, ops_b)

    # a 150 bp planted insertion shifts the diagonal; the auto band covers it
    ins = rng.integers(0, 4, 150).astype(np.uint8)
    q2 = np.concatenate([q[:1500], ins, q[1500:]])
    ops_f2, qs2, qe2 = host_edit_ops(q2, t, band=1 << 30)
    ops_b2, qs2b, qe2b = _host_edit_ops_banded(q2, t, band=450)
    assert (qs2, qe2) == (qs2b, qe2b)
    assert np.array_equal(ops_f2, ops_b2)
