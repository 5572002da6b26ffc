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
    """Per-overlap consensus weight (consensus_one_read.c:11-16)."""
    e = (100.0 - ident_perc) / 100.0 / 2.0
    w = (1.0 - e) * (1.0 - e) + e * e / 3.0
    return jnp.where(100.0 - ident_perc <= 1e-6, 1.0, w)


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
