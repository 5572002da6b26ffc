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


def use_seg_scatter() -> bool:
    """Segment-sum tag accumulator (opt-in, NECAT_TPU_SEG_SCATTER=1): pairs
    sort by template row, every tag plane prefix-sums once along the pair
    axis and per-row sums come from two boundary gathers — O(P log P) memory
    traffic instead of the one-hot matmul's O(TB*P) MXU contraction.
    Measured SLOWER than the matmul on TPU v5e (200 kb bench steady 34.5 vs
    48.9 reads/s): the HBM-bound log-step prefix sums lose to the MXU, which
    runs the [TB, P] x [P, C*Lt] contraction near peak. Kept as an A/B knob
    for parts with bigger TB or narrower planes."""
    import os
    v = os.environ.get("NECAT_TPU_SEG_SCATTER")
    if v is not None:
        return v not in ("0", "false")
    return False


def use_mm_scatter() -> bool:
    """The one-hot-matmul tag accumulator is the TPU path (XLA scatter-add
    serializes on TPU: 17 s/call measured vs ~5 ms for the MXU formulation).
    The scatter formulation remains the exact oracle and the CPU default."""
    import os
    v = os.environ.get("NECAT_TPU_MM_SCATTER")
    if v is not None:
        return v not in ("0", "false")
    return jax.default_backend() == "tpu"


N_INSB = 7  # inserted bases recoverable per column run (= max_delta - 1)


def _row_shift(x, s):
    """out[p, t] = x[p, t - s_p] (0 outside), s any int32[P]; L % 128 == 0.

    TPU take_along_axis along the lane axis runs ~45 M elem/s (measured 173 ms
    for one [512, 24576] gather); this decomposition — 128-aligned block gather
    (whole-tile rows) + a 7-step binary fine shift — does the same re-indexing
    in ~13 ms.

    Decomposition: s = 128*q + r with r in [0,128). The coarse pass builds
    z[t'] = x[t' - 128*(q+1)] over an extended axis [0, L+128) (the extra
    block supplies the residue the fine pass shifts back in); the fine pass
    is y[t] = z[t + (128-r)], a per-row left shift realized as one static
    shift plus 7 conditional power-of-two shifts."""
    P, L = x.shape
    Lp = -(-L // 128) * 128
    if Lp != L:  # tiers are 128-multiples in production; pad for odd test sizes
        x = jnp.concatenate([x, jnp.zeros((P, Lp - L), x.dtype)], axis=1)
        return _row_shift(x, s)[:, :L]
    NB = L // 128
    q = jnp.floor_divide(s, 128)
    r = (s - 128 * q).astype(jnp.int32)
    xb = x.reshape(P, NB, 128)
    zbi = jnp.arange(NB + 1, dtype=jnp.int32)[None, :]
    src = zbi - (q[:, None] + 1)
    okb = (src >= 0) & (src < NB)
    z = jnp.where(okb[:, :, None],
                  jnp.take_along_axis(xb, jnp.clip(src, 0, NB - 1)[:, :, None],
                                      axis=1),
                  0).reshape(P, L + 128)
    u = 127 - r                       # y[t] = z[t + 1 + u], u in [0,128)
    y = z[:, 1:]
    k = 64
    while k >= 1:
        sh = jnp.concatenate([y[:, k:], jnp.zeros((P, k), x.dtype)], axis=1)
        y = jnp.where((u[:, None] & k) != 0, sh, y)
        k //= 2
    return y[:, :L]


def _shift_left1(x, fill):
    """out[p, t] = x[p, t + 1] with `fill` in the last column."""
    P, L = x.shape
    return jnp.concatenate([x[:, 1:], jnp.full((P, 1), fill, x.dtype)], axis=1)


@functools.partial(jax.jit, static_argnames=("reversed_part",),
                   donate_argnames=("weights", "coverage"))
def scatter_pass_cols_mm(weights, coverage, cols, insb, lead, leadb, jc,
                         at, pair_row, pair_w, tsize, reversed_part: bool):
    """insb: one int32[P, Lt] word or a tuple of them (word w serves run
    ranks 7w+1..7w+7 — the polish long-insertion channel); leadb must carry
    7*words leading-run bases."""
    if not isinstance(insb, tuple):
        insb = (insb,)
    """MXU formulation of scatter_pass_cols (same tags, same totals).

    Key observation: a column j's template position is an AFFINE function of j
    (fwd t = at + j - 1; rev t = at - j), so re-indexing the per-column encoding
    onto the template axis is one aligned gather per pair, after which every
    (delta, base) tag plane is a pure elementwise mask over [P, Lt] and the
    accumulation over pairs is a dot with the [TB, P] row-assignment matrix —
    dense MXU work instead of a serialized scatter-add. Inserted bases come
    from the `insb` per-column side channel (first/last N_INSB bases of each
    run, banded.ops_to_cols / pallas backtrack) and the `leadb` leading-run
    bases (extend_batch), not a query gather; the delta policy matches
    scatter_pass_cols exactly (fwd keeps the first D-1 insertions of a run,
    rev the last D-1, runs of the clipped column jc excluded).

    cols/insb must be pre-padded/sliced to second dim == Lt (columns beyond Lt
    cannot land in-bounds: fwd t = at+j-1 < tsize <= Lt, rev t = at-j >= 0) —
    this keeps one compiled program per (P, Lt) instead of per (P, MC, Lt)."""
    P, MC = cols.shape
    TBp1, D, _, Lt = weights.shape
    assert MC == Lt, "canonicalize cols/insb to Lt (pad_cols_to) before calling"
    TB = TBp1 - 1
    f32 = jnp.float32
    seg = use_seg_scatter()
    if seg:
        # segment-sum accumulation (see use_seg_scatter): sort pairs by row so
        # each row's tags are one contiguous lane run; the reduction is then a
        # single prefix sum + two boundary gathers, independent of TB. The
        # permutation gathers only the per-pair inputs (cols/insb rows are
        # leading-axis contiguous) — cheap next to the plane tensors
        perm = jnp.argsort(pair_row.astype(jnp.int32))
        cols = cols[perm]
        insb = tuple(x[perm] for x in insb)
        lead, leadb, jc = lead[perm], leadb[perm], jc[perm]
        at, tsize = at[perm], tsize[perm]
        pair_row, pair_w = pair_row[perm], pair_w[perm]
    rows = jnp.arange(TB, dtype=jnp.int32)
    if not seg:
        assign = (pair_row[None, :] == rows[:, None])
        Mw = jnp.where(assign, pair_w[None, :], 0.0).astype(f32)  # [TB, P]
        M1 = assign.astype(f32)
    hp = jax.lax.Precision.HIGHEST

    # the one-hot planes are exact in bf16 ({0,1}); with f32 Mw and HIGHEST
    # precision the products are exact, and the bf16 HBM tensor halves the
    # dominant traffic of this op
    onehot_t = jnp.bfloat16

    t = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    j_of_t = (t - at[:, None] + 1) if not reversed_part else (at[:, None] - t)
    tok = t < tsize[:, None]

    # re-index the per-column arrays onto the template axis: column j lives at
    # t = at+j-1 (fwd) or t = at-j (rev) — a per-pair shift (after a static
    # flip for rev), done with the block-shift decomposition, not a gather
    if not reversed_part:
        colsS = _row_shift(cols, at)
        insbS = tuple(_row_shift(x, at) for x in insb)
        colsI_s, insbI_s = colsS, insbS
    else:
        colsS = _row_shift(cols[:, ::-1], at - MC)
        insbS = tuple(_row_shift(x[:, ::-1], at - MC) for x in insb)
        colsI_s = _shift_left1(colsS, 0)
        insbI_s = tuple(_shift_left1(x, 0) for x in insbS)

    # ---- delta-0 planes (one per base incl. gap) + coverage
    ok0 = (j_of_t >= 1) & (j_of_t <= jc[:, None]) & tok
    colsT = jnp.where(ok0, colsS, OP_PAD)
    op0 = colsT & 3
    act0 = op0 != OP_PAD
    base0 = jnp.where(op0 == OP_DEL, GAP_CODE, (colsT >> 3) & 3)
    d0 = (base0[:, None, :] == jnp.arange(5, dtype=jnp.int32)[None, :, None]) \
        & act0[:, None, :]                                         # [P, 5, Lt]

    # ---- insertion planes from insb: delta d (1..D-1), base b (0..3)
    # fwd: a run lands at its own column's t; rev: one position further left
    ji = j_of_t if not reversed_part else (j_of_t - 1)
    oki = (ji >= 1) & (ji <= jc[:, None] - 1) & tok
    colsI = jnp.where(oki, colsI_s, OP_PAD)
    insbT = tuple(jnp.where(oki, x, 0) for x in insbI_s)
    kI = jnp.where((colsI & 3) != OP_PAD, colsI >> 5, 0)
    nd = min(D - 1, N_INSB * len(insb))
    sh0 = 0 if not reversed_part else 14

    def ins_plane(d):
        w_, dl = (d - 1) // N_INSB, (d - 1) % N_INSB
        bd = (insbT[w_] >> (sh0 + 2 * dl)) & 3
        okd = kI >= d
        return (bd[:, None, :] == jnp.arange(4, dtype=jnp.int32)[None, :, None]) \
            & okd[:, None, :]                                      # [P, 4, Lt]

    if seg:
        lo = jnp.searchsorted(pair_row.astype(jnp.int32), rows, side="left")
        hi = jnp.searchsorted(pair_row.astype(jnp.int32), rows, side="right")

        def seg_reduce(x):
            """x f32[P, C, Lt] in row-sorted lane order -> per-row sums
            [TB, C, Lt]: inclusive prefix sum + boundary-difference gathers
            (rows TB and beyond sort past hi and drop out naturally)."""
            cum = jnp.cumsum(x, axis=0)
            cumz = jnp.concatenate([jnp.zeros_like(cum[:1]), cum], axis=0)
            return cumz[hi] - cumz[lo]

        # one seg_reduce per plane group (NOT one concatenated tensor: the
        # [P, 5+4nd+1, Lt] f32 concat + its prefix sum alone is ~5.7 GB at
        # P=512, Lt=40960 and OOMed the fused program; sequential groups let
        # XLA reuse the transient buffers)
        wvec = pair_w[:, None, None]
        w0 = seg_reduce(jnp.where(d0, wvec, 0.0))              # [TB, 5, Lt]
        cov = seg_reduce(act0.astype(f32)[:, None, :])[:, 0]   # [TB, Lt]
        wk = jnp.stack([seg_reduce(jnp.where(ins_plane(d), wvec, 0.0))
                        for d in range(1, nd + 1)], axis=1)    # [TB, nd, 4, Lt]
    else:
        w0 = jnp.einsum("bp,pcl->bcl", Mw, d0.astype(onehot_t), precision=hp,
                        preferred_element_type=f32)
        cov = jnp.einsum("bp,pl->bl", M1, act0.astype(onehot_t), precision=hp,
                         preferred_element_type=f32)
        wk = [jnp.einsum("bp,pcl->bcl", Mw, ins_plane(d).astype(onehot_t),
                         precision=hp, preferred_element_type=f32)
              for d in range(1, nd + 1)]
        wk = jnp.stack(wk, axis=1)                                 # [TB, nd, 4, Lt]

    upd = jnp.concatenate([
        w0[:, None, :, :],
        jnp.concatenate([wk, jnp.zeros((TB, nd, 1, Lt), f32)], axis=2),
    ], axis=1)                                                     # [TB, D, 5, Lt]
    weights = weights.at[:TB].add(upd)
    coverage = coverage.at[:TB].add(cov.astype(jnp.int32))

    # ---- leading-run insertions (before column 1): <= N_INSB tiny scatters
    # leadb entry d-1 = query base at delta d (prepared by extend_batch for
    # the pass direction)
    tl = at - 1
    okl_t = (tl >= 0) & (tl < tsize) & (pair_row < TB) & (jc > 0)
    lin_parts = []
    w_parts = []
    for d in range(1, nd + 1):
        okd = okl_t & (lead >= d)
        qb = leadb[:, d - 1].astype(jnp.int32)
        row = jnp.where(okd, pair_row, TB)
        lin = ((row * D + d) * 5 + qb) * Lt + jnp.clip(tl, 0, Lt - 1)
        lin_parts.append(lin)
        w_parts.append(jnp.where(okd, pair_w, 0.0))
    lin_all = jnp.concatenate(lin_parts)
    w_all = jnp.concatenate(w_parts)
    weights = weights.reshape(-1).at[lin_all].add(w_all).reshape(weights.shape)
    return weights, coverage


@functools.partial(jax.jit, donate_argnames=("weights", "coverage"))
def scatter_chunk_mm(weights, coverage,
                     left_cols, left_insb, left_lead, left_leadb, left_jc,
                     right_cols, right_insb, right_lead, right_leadb, right_jc,
                     at, pair_row, pair_w, tsize):
    """Both extension passes of one chunk scattered in ONE dispatch
    (pad-to-Lt included) — a tunnel-attached device sees a single launch.
    left_insb/right_insb: one insb word or a tuple of them."""
    from necat_tpu.align.banded import OP_PAD as _PAD
    Lt = weights.shape[3]
    if not isinstance(left_insb, tuple):
        left_insb = (left_insb,)
    if not isinstance(right_insb, tuple):
        right_insb = (right_insb,)
    weights, coverage = scatter_pass_cols_mm(
        weights, coverage, pad_cols_to(right_cols, Lt, _PAD),
        tuple(pad_cols_to(x, Lt, 0) for x in right_insb),
        right_lead, right_leadb, right_jc,
        at, pair_row, pair_w, tsize, reversed_part=False)
    weights, coverage = scatter_pass_cols_mm(
        weights, coverage, pad_cols_to(left_cols, Lt, _PAD),
        tuple(pad_cols_to(x, Lt, 0) for x in left_insb),
        left_lead, left_leadb, left_jc,
        at, pair_row, pair_w, tsize, reversed_part=True)
    return weights, coverage


def pad_cols_to(x, Lt: int, fill: int):
    """Canonicalize a per-column array's second dim to Lt (see
    scatter_pass_cols_mm): slice when longer, pad with `fill` when shorter.
    Eager jnp ops — trivial compiles, so shape pairs are cheap."""
    P, MC = x.shape
    if MC == Lt:
        return x
    if MC > Lt:
        return x[:, :Lt]
    return jnp.concatenate([x, jnp.full((P, Lt - MC), fill, x.dtype)], axis=1)


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
