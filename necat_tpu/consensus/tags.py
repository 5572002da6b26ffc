"""Alignment ops -> weighted tag tensor scatter.

TPU-native replacement for the AlignTag machinery (src/tasc/align_tags.c get_cns_tags
+ cns_aux.c build_backbone): instead of materializing per-column AlignTag structs,
sorting them, and building a link DAG with arena allocators, alignments scatter their
per-column weights directly into a dense tensor

    weights[template_row, t_pos, delta, base]  (base 4 = gap)

plus `coverage[template_row, t_pos]` counting delta-0 columns (cns_aux.c:96-99).
Delta counts query bases since the last template-consuming column, exactly the `jj`
logic of get_cns_tags (align_tags.c:47-66); runs longer than max_delta are dropped
(the reference aborts the whole alignment at delta 255, align_tags.c:40-44).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from necat_tpu.align.banded import OP_DEL, OP_DIAG, OP_INS, OP_PAD

GAP_CODE = 4


@jax.jit
def combined_ops(left_ops, left_n, right_ops, right_n):
    """Merge per-pair extension passes into forward-order ops:
    reverse(left_ops[:left_n]) ++ right_ops[:right_n], OP_PAD-tail."""
    P, L = left_ops.shape
    LC = L + right_ops.shape[1]
    i = jnp.arange(LC)[None, :]
    in_left = i < left_n[:, None]
    li = jnp.clip(left_n[:, None] - 1 - i, 0, L - 1)
    ri = jnp.clip(i - left_n[:, None], 0, right_ops.shape[1] - 1)
    ops = jnp.where(in_left,
                    jnp.take_along_axis(left_ops, li, axis=1),
                    jnp.take_along_axis(right_ops, ri, axis=1))
    n = left_n + right_n
    ops = jnp.where(i < n[:, None], ops, OP_PAD)
    return ops.astype(jnp.uint8), n


def scatter_tags(
    weights,        # f32[TB+1, D, 5, Lt] — row TB is the trash row (positions
                    # LAST: trailing small dims would be tile-padded 25x)
    coverage,       # i32[TB+1, Lt]
    ops,            # uint8[P, LC] forward-order combined ops
    n_ops,          # i32[P]
    qbatch,         # uint8[P, LQ] query codes on the qdir strand
    qoff,           # i32[P] query start of the alignment (qdir-strand coords)
    toff,           # i32[P] template start
    pair_row,       # i32[P] template row of each pair (TB = dropped pair)
    pair_w,         # f32[P] per-pair weight (calc_cns_weight of ident)
    tsize,          # i32[P] template length
):
    """Accumulate tag weights of a batch of alignments into the dense tensors."""
    return _scatter_tags(weights, coverage, ops, n_ops, qbatch, qoff, toff,
                         pair_row, pair_w, tsize)


@jax.jit
def _scatter_tags(weights, coverage, ops, n_ops, qbatch, qoff, toff,
                  pair_row, pair_w, tsize):
    P, LC = ops.shape
    TBp1, D, _, Lt = weights.shape
    i = jnp.arange(LC)[None, :]
    valid = i < n_ops[:, None]
    consume_q = (ops != OP_DEL) & valid & (ops != OP_PAD)
    consume_t = (ops != OP_INS) & valid & (ops != OP_PAD)
    cq = jnp.cumsum(consume_q, axis=1)
    ct = jnp.cumsum(consume_t, axis=1)
    qidx = jnp.clip(qoff[:, None] + cq - 1, 0, qbatch.shape[1] - 1)
    qbase = jnp.take_along_axis(qbatch, qidx, axis=1).astype(jnp.int32)
    t_pos = toff[:, None] + ct - 1
    is_ins = ops == OP_INS
    # delta = distance to the last non-INS op (the jj counter)
    last_non_ins = jax.lax.cummax(jnp.where(~is_ins & valid, i, -1), axis=1)
    delta = jnp.where(is_ins, i - last_non_ins, 0)
    base = jnp.where(ops == OP_DEL, GAP_CODE, qbase)

    ok = valid & (t_pos >= 0) & (t_pos < tsize[:, None]) & (delta < D) & (ops != OP_PAD)
    ok &= pair_row[:, None] < TBp1 - 1
    row = jnp.where(ok, pair_row[:, None], TBp1 - 1)
    t_safe = jnp.where(ok, t_pos, 0)
    d_safe = jnp.where(ok, delta, 0)
    b_safe = jnp.where(ok, base, 0)

    lin = ((row * D + d_safe) * 5 + b_safe) * Lt + t_safe
    w = jnp.where(ok, pair_w[:, None], 0.0)
    weights = weights.reshape(-1).at[lin.reshape(-1)].add(w.reshape(-1)).reshape(weights.shape)

    cov_ok = ok & (delta == 0)
    lin_c = row * Lt + t_safe
    c = jnp.where(cov_ok, 1, 0)
    coverage = coverage.reshape(-1).at[lin_c.reshape(-1)].add(c.reshape(-1)).reshape(coverage.shape)
    return weights, coverage


def calc_cns_weight(ident_perc):
    """Per-overlap consensus weight (consensus_one_read.c:11-16).

    Host-side numpy on purpose: inputs are small ragged host arrays, and a jnp
    version would recompile for every chunk length (measured 1s/chunk through
    the device tunnel)."""
    ident_perc = np.asarray(ident_perc, np.float64)
    e = (100.0 - ident_perc) / 100.0 / 2.0
    w = (1.0 - e) * (1.0 - e) + e * e / 3.0
    return np.where(100.0 - ident_perc <= 1e-6, 1.0, w).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("reversed_part",))
def scatter_pass(weights, coverage, ops, n_ops, qbatch, aq, at, pair_row,
                 pair_w, tsize, reversed_part: bool):
    """Scatter ONE extension pass's tags directly (no combined-op merge).

    reversed_part=False: ops run forward from the anchor (right pass).
    reversed_part=True: ops run leftward from the anchor (left pass, i.e. the
    REVERSE of their forward-alignment order); tag coordinates count down from
    the anchor and insertion deltas use the distance to the NEXT
    target-consuming op (the run order flips under reversal).
    """
    P, LC = ops.shape
    TBp1, D, _, Lt = weights.shape
    i = jnp.arange(LC, dtype=jnp.int32)[None, :]
    valid = (i < n_ops[:, None]) & (ops != OP_PAD)
    consume_q = (ops != OP_DEL) & valid
    consume_t = (ops != OP_INS) & valid
    cq = jnp.cumsum(consume_q, axis=1)
    ct = jnp.cumsum(consume_t, axis=1)
    is_ins = ops == OP_INS

    if not reversed_part:
        qidx = aq[:, None] + cq - 1
        t_pos = at[:, None] + ct - 1
        last_non_ins = jax.lax.cummax(jnp.where(~is_ins & valid, i, -1), axis=1)
        delta = jnp.where(is_ins, i - last_non_ins, 0)
    else:
        qidx = aq[:, None] - cq
        # DIAG/DEL at left-index i sit at t = at - ct_i; INS belong after the
        # NEXT target-consuming op: t = at - ct_i - 1
        t_pos = jnp.where(is_ins, at[:, None] - ct - 1, at[:, None] - ct)
        rev = lambda x: x[:, ::-1]
        big = jnp.int32(LC)
        i_b = jnp.broadcast_to(i, ops.shape)
        nni_rev = jax.lax.cummin(jnp.where(rev(~is_ins & valid), rev(i_b), big), axis=1)
        nni = rev(nni_rev)          # next non-INS index >= i (LC if none)
        delta = jnp.where(is_ins, jnp.where(nni < LC, nni - i, D), 0)

    qb = jnp.take_along_axis(qbatch, jnp.clip(qidx, 0, qbatch.shape[1] - 1),
                             axis=1).astype(jnp.int32)
    base = jnp.where(ops == OP_DEL, GAP_CODE, qb)

    ok = valid & (t_pos >= 0) & (t_pos < tsize[:, None]) & (delta < D)
    ok &= pair_row[:, None] < TBp1 - 1
    row = jnp.where(ok, pair_row[:, None], TBp1 - 1)
    t_safe = jnp.where(ok, t_pos, 0)
    d_safe = jnp.where(ok, delta, 0)
    b_safe = jnp.where(ok, base, 0)

    lin = ((row * D + d_safe) * 5 + b_safe) * Lt + t_safe
    w = jnp.where(ok, pair_w[:, None], 0.0)
    weights = weights.reshape(-1).at[lin.reshape(-1)].add(w.reshape(-1)).reshape(weights.shape)

    cov_ok = ok & (delta == 0)
    lin_c = row * Lt + t_safe
    c = jnp.where(cov_ok, 1, 0)
    coverage = coverage.reshape(-1).at[lin_c.reshape(-1)].add(c.reshape(-1)).reshape(coverage.shape)
    return weights, coverage


@functools.partial(jax.jit, static_argnames=("reversed_part",))
def scatter_pass_cols(weights, coverage, cols, lead, jc, qbatch, aq, at,
                      pair_row, pair_w, tsize, reversed_part: bool):
    """Scatter one extension pass's tags from the PER-COLUMN encoding
    (banded.ops_to_cols / pallas backtrack output) — no op strings.

    Two passes, both D-independent:
    * target axis [P, MC]: the delta-0 tag of every consumer column
      (query base for DIAG, gap for DEL) + the coverage count;
    * query axis [P, LQ]: every inserted query base, located by scattering
      per-column run starts and flooding them right with cummax. A query
      position qp then knows its column j, its column's start qstart and
      cumulative consumption CQ, from which delta follows in closed form
      (fwd: qp - qstart (+1 after DEL); rev: CQ - qp, since reversal flips
      the insertion-run order — see scatter_pass reversed_part semantics).
    """
    P, MC = cols.shape
    TBp1, D, _, Lt = weights.shape
    LQ = qbatch.shape[1]
    op = cols & 3
    k = cols >> 5
    jcol = jnp.arange(1, MC + 1, dtype=jnp.int32)[None, :]
    notpad = op != OP_PAD
    isdiag = (op == OP_DIAG) & notpad
    isdel = (op == OP_DEL) & notpad
    dq = jnp.where(isdiag, 1, 0) + jnp.where(notpad, k, 0)
    CQ = lead[:, None] + jnp.cumsum(dq, axis=1)
    trash = TBp1 - 1
    okrow = pair_row < trash

    # clipped query consumption (ins of column jc and later columns excluded)
    selj = jnp.clip(jc - 1, 0, MC - 1)[:, None]
    g = lambda x: jnp.take_along_axis(x, selj, axis=1)[:, 0]
    qcons = jnp.where(jc > 0, g(CQ) - g(k), 0)

    # ---------------- target-axis pass: delta-0 tags + coverage
    active = notpad & (jcol <= jc[:, None])
    qidx_diag = CQ - k - 1
    if not reversed_part:
        t_pos = at[:, None] + jcol - 1
        q_abs = aq[:, None] + qidx_diag
    else:
        t_pos = at[:, None] - jcol
        q_abs = aq[:, None] - 1 - qidx_diag
    qb = jnp.take_along_axis(qbatch, jnp.clip(q_abs, 0, LQ - 1), axis=1).astype(jnp.int32)
    base = jnp.where(isdel, GAP_CODE, qb)
    ok0 = active & (t_pos >= 0) & (t_pos < tsize[:, None]) & okrow[:, None]
    row = jnp.where(ok0, pair_row[:, None], trash)
    t_safe = jnp.where(ok0, t_pos, 0)
    b_safe = jnp.where(ok0, base, 0)
    lin = ((row * D + 0) * 5 + b_safe) * Lt + t_safe
    w = jnp.where(ok0, pair_w[:, None], 0.0)
    weights = weights.reshape(-1).at[lin.reshape(-1)].add(w.reshape(-1)).reshape(weights.shape)
    lin_c = row * Lt + t_safe
    coverage = coverage.reshape(-1).at[lin_c.reshape(-1)].add(
        jnp.where(ok0, 1, 0).reshape(-1)).reshape(coverage.shape)

    # ---------------- query-axis pass: insertion tags (delta >= 1)
    # run start of column j on the query axis (DIAG: its own qp; DEL: first
    # ins qp); columns that consume no query scatter nothing
    qstart = CQ - k - jnp.where(isdiag, 1, 0)
    consumes = notpad & ((k > 0) | isdiag)
    rows_p = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[:, None], (P, MC))
    qs_safe = jnp.clip(qstart, 0, LQ - 1)
    linq = rows_p * LQ + qs_safe
    def smax(vals, init):
        buf = jnp.full(P * LQ, init, jnp.int32)
        v = jnp.where(consumes, vals, init)
        return buf.at[linq.reshape(-1)].max(v.reshape(-1)).reshape(P, LQ)
    m_flag = smax((jcol << 1) | jnp.where(isdiag, 1, 0), -1)
    m_qst = smax(qstart, -1)
    m_cq = smax(CQ, -1)
    # virtual column 0: the leading insertions (qstart 0, j 0, CQ lead)
    haslead = (lead > 0)[:, None]
    first = jnp.arange(LQ, dtype=jnp.int32)[None, :] == 0
    m_flag = jnp.where(first & haslead & (m_qst != 0), 0, m_flag)
    m_cq = jnp.where(first & haslead & (m_qst != 0), lead[:, None], m_cq)
    m_qst = jnp.where(first & haslead & (m_qst != 0), 0, m_qst)
    c_flag = jax.lax.cummax(m_flag, axis=1)
    c_qst = jax.lax.cummax(m_qst, axis=1)
    c_cq = jax.lax.cummax(m_cq, axis=1)
    j_of = c_flag >> 1
    diag_of = (c_flag & 1) == 1
    qp = jnp.arange(LQ, dtype=jnp.int32)[None, :]
    if not reversed_part:
        delta = qp - c_qst + jnp.where(diag_of, 0, 1)
        t_ins = at[:, None] + j_of - 1
        q_abs_i = aq[:, None] + qp
    else:
        delta = c_cq - qp
        t_ins = at[:, None] - j_of - 1
        q_abs_i = aq[:, None] - 1 - qp
    okq = (c_flag >= 0) & (qp < qcons[:, None]) & (delta >= 1) & (delta < D)
    if reversed_part:
        # a DIAG column's own query position is its delta-0 tag (already
        # scattered in the target pass); its reversed delta formula gives k+1
        okq &= ~(diag_of & (qp == c_qst))
    okq &= (t_ins >= 0) & (t_ins < tsize[:, None]) & okrow[:, None]
    qb_i = jnp.take_along_axis(qbatch, jnp.clip(q_abs_i, 0, LQ - 1), axis=1).astype(jnp.int32)
    rowq = jnp.where(okq, pair_row[:, None], trash)
    t_s = jnp.where(okq, t_ins, 0)
    d_s = jnp.where(okq, delta, 0)
    b_s = jnp.where(okq, qb_i, 0)
    linw = ((rowq * D + d_s) * 5 + b_s) * Lt + t_s
    wq = jnp.where(okq, pair_w[:, None], 0.0)
    weights = weights.reshape(-1).at[linw.reshape(-1)].add(wq.reshape(-1)).reshape(weights.shape)
    return weights, coverage
