"""Batched adaptive-banded alignment extension with traceback.

TPU-native replacement for the reference's blockwise extension aligner
(src/gapped_align/oc_aligner.c:157-451 + edlib_ex.c): instead of Myers bit-parallel
64-bit words in 512-bp blocks with block re-centering, we run a column-parallel banded
edit-distance DP whose band *adapts* (shifts 0/1/2 rows per column toward the current
band argmin), which is the continuous version of the reference's per-block retreat and
re-center. The in-column dependency (consecutive insertions) is solved with a
min-plus prefix scan (cummin), so each column is fully vector-parallel on the VPU.

Extension semantics mirror onc_align: from an anchor seed, extend left over reversed
prefixes and right over suffixes; each pass aligns to the clamped far corner and is
then clipped back to the last run of TAIL_MATCH consecutive matches
(oc_aligner.c:223-259 retreat logic, kOcaMatCnt=8).

Ops encoding: 0 = diagonal (consume query+target), 1 = consume target only (query
gap), 2 = consume query only (insertion), 3 = padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, not jnp: a module-level jnp constant would initialise the XLA
# backend at import time and break jax.distributed.initialize (launcher.py)
INF = np.int32(1 << 20)
OP_DIAG, OP_DEL, OP_INS, OP_PAD = 0, 1, 2, 3
TAIL_MATCH = 8  # kOcaMatCnt (oc_aligner.c:9)


def _use_pallas(batch: int) -> bool:
    """Use the Pallas forward kernel on TPU (exact same results; ~100x faster
    than the scan formulation). The scan path remains for CPU tests and odd
    batch sizes."""
    import os
    if os.environ.get("NECAT_TPU_NO_PALLAS"):
        return False
    if batch % 8 != 0:
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("W", "max_cols"))
def banded_forward(a, b, la, lb, W: int, max_cols: int):
    """Banded DP of a[0:la] vs b[0:lb] per pair, from (0,0) toward (la, lb).

    a: int[B, LA] query codes; b: int[B, LB>=max_cols] target codes.
    Returns (dirs uint8[B, max_cols, W], offs int32[B, max_cols+1], S_final, cost).
    Band at column j covers query rows [offs[j], offs[j]+W).
    """
    B = a.shape[0]
    ar = jnp.arange(W, dtype=jnp.int32)

    S0 = jnp.where(ar[None, :] <= la[:, None], ar[None, :], INF).astype(jnp.int32)
    off0 = jnp.zeros((B,), jnp.int32)

    def step(carry, j):
        S_prev, off_prev = carry
        active = j <= lb  # [B]

        # adaptive shift: move band toward the argmin third of the previous column
        m = jnp.argmin(S_prev, axis=1).astype(jnp.int32)
        d = jnp.where(m > (2 * W) // 3, 2, jnp.where(m > W // 3, 1, 0))
        d = jnp.where(j == 1, 0, d)  # first transition keeps off=0
        off = jnp.clip(off_prev + d, 0, jnp.maximum(la, 0))
        d = off - off_prev

        rows = off[:, None] + ar[None, :]              # query rows r of each slot
        # neighbors in previous column: slot s here = row r -> prev slot s+d
        sd = ar[None, :] + d[:, None]
        getp = lambda idx: jnp.where((idx >= 0) & (idx < W),
                                     jnp.take_along_axis(S_prev, jnp.clip(idx, 0, W - 1), axis=1),
                                     INF)
        left_val = getp(sd) + 1
        qbase = jnp.take_along_axis(a, jnp.clip(rows - 1, 0, a.shape[1] - 1), axis=1)
        tbase = jax.lax.dynamic_slice_in_dim(b, jnp.clip(j - 1, 0, b.shape[1] - 1), 1, axis=1)
        sub = (qbase != tbase).astype(jnp.int32)
        diag_val = jnp.where(rows >= 1, getp(sd - 1) + sub, INF)
        # row 0 can only come from the left (all-deletion path)
        A = jnp.minimum(left_val, diag_val)
        A = jnp.where(rows > la[:, None], INF, A)
        # up moves within the column: S[s] = min(A[s], S[s-1] + 1) via cummin
        base = A - ar[None, :]
        Scur = jax.lax.cummin(base, axis=1) + ar[None, :]
        Scur = jnp.minimum(Scur, INF)
        Scur = jnp.where(rows > la[:, None], INF, Scur)

        up_val = jnp.concatenate([jnp.full((B, 1), INF), Scur[:, :-1] + 1], axis=1)
        dirs = jnp.where(Scur == diag_val, OP_DIAG,
                         jnp.where(Scur == up_val, OP_INS,
                                   jnp.where(Scur == left_val, OP_DEL, OP_PAD))).astype(jnp.uint8)

        S_out = jnp.where(active[:, None], Scur, S_prev)
        off_out = jnp.where(active, off, off_prev)
        return (S_out, off_out), (dirs, off_out)

    (S_fin, off_fin), (dirs, offs) = jax.lax.scan(
        step, (S0, off0), jnp.arange(1, max_cols + 1, dtype=jnp.int32))
    dirs = dirs.transpose(1, 0, 2)                      # [B, max_cols, W]
    offs = jnp.concatenate([off0[:, None], offs.transpose(1, 0)], axis=1)
    # cost at (la, lb): slot = la - off at column lb
    slot_end = jnp.clip(la - off_fin, 0, W - 1)
    cost = jnp.take_along_axis(S_fin, slot_end[:, None], axis=1)[:, 0]
    return dirs, offs, S_fin, cost


@functools.partial(jax.jit, static_argnames=("max_ops",))
def banded_traceback(dirs, offs, la, lb, max_ops: int):
    """Walk dirs from (la, lb) back to (0, 0); return ops [B, max_ops] start->end
    (left-aligned, OP_PAD tail) and op counts.

    Uses a while_loop so the walk stops when every pair reaches the origin
    (typical path length la+lb, far below the max_ops bound)."""
    B, LB, W = dirs.shape
    bidx = jnp.arange(B)

    def cond(state):
        r, j, done, ops_rev, k = state
        return (~done).any() & (k < max_ops)

    def body(state):
        r, j, done, ops_rev, k = state
        slot = jnp.clip(r - jnp.take_along_axis(offs, j[:, None], axis=1)[:, 0], 0, W - 1)
        jj = jnp.clip(j - 1, 0, LB - 1)
        # mask enrichment bits (pallas forward packs mismatch/qbase at bits 2+;
        # keep the OP_PAD sentinel, whose low bits are already 3)
        dcur = dirs[bidx, jj, slot] & 3
        # forced moves at borders
        dcur = jnp.where(r == 0, OP_DEL, dcur)
        dcur = jnp.where(j == 0, OP_INS, dcur)
        op = jnp.where(done, OP_PAD, dcur).astype(jnp.uint8)
        dr = jnp.where((op == OP_DIAG) | (op == OP_INS), 1, 0)
        dj = jnp.where((op == OP_DIAG) | (op == OP_DEL), 1, 0)
        r = r - jnp.where(done, 0, dr)
        j = j - jnp.where(done, 0, dj)
        done = done | ((r == 0) & (j == 0))
        ops_rev = ops_rev.at[:, k].set(op)
        return (r, j, done, ops_rev, k + 1)

    done0 = (la == 0) & (lb == 0)
    ops_rev0 = jnp.full((B, max_ops), OP_PAD, jnp.uint8)
    _, _, _, ops_rev, _ = jax.lax.while_loop(
        cond, body, (la, lb, done0, ops_rev0, jnp.int32(0)))
    n_ops = (ops_rev != OP_PAD).sum(axis=1).astype(jnp.int32)
    # reverse into start->end, left-aligned
    idx = n_ops[:, None] - 1 - jnp.arange(max_ops)[None, :]
    ops = jnp.where(idx >= 0, jnp.take_along_axis(ops_rev, jnp.clip(idx, 0, max_ops - 1), axis=1), OP_PAD)
    return ops.astype(jnp.uint8), n_ops


@functools.partial(jax.jit, static_argnames=("tail_match",))
def clip_tail(ops, n_ops, a, b, tail_match: int = TAIL_MATCH):
    """Clip the far end of each alignment back to the end of the last run of
    `tail_match` consecutive matches (oc_aligner.c:223-259). Returns new n_ops."""
    B, L = ops.shape
    qpos = jnp.cumsum((ops != OP_DEL) & (ops != OP_PAD), axis=1)  # query consumed incl. this op
    tpos = jnp.cumsum((ops != OP_INS) & (ops != OP_PAD), axis=1)
    qb = jnp.take_along_axis(a, jnp.clip(qpos - 1, 0, a.shape[1] - 1), axis=1)
    tb = jnp.take_along_axis(b, jnp.clip(tpos - 1, 0, b.shape[1] - 1), axis=1)
    valid = jnp.arange(L)[None, :] < n_ops[:, None]
    match = (ops == OP_DIAG) & (qb == tb) & valid
    # run length of consecutive matches ending at i: i - (last non-match <= i)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    last_nonmatch = jax.lax.cummax(jnp.where(match, -1, idx), axis=1)
    runs = idx - last_nonmatch
    good = runs >= tail_match
    any_good = good.any(axis=1)
    last_good = jnp.max(jnp.where(good, jnp.arange(L)[None, :], -1), axis=1)
    n_clip = jnp.where(any_good, last_good + 1, 0).astype(jnp.int32)
    return n_clip, match


N_INSB = 7  # inserted bases recorded per column (deltas 1..N_INSB; = max_delta-1)


@functools.partial(jax.jit, static_argnames=("MC", "words"))
def ops_to_cols(ops, n_ops, a, b, MC: int, words: int = 1):
    """Convert an op sequence to the PER-COLUMN encoding.

    cols int32[B, MC]: entry j-1 describes target column j (1-based):
        op:2 | match:1 | consumed-query-base:2 | k:25+
    where op is the column's target-consuming op (OP_DIAG/OP_DEL, OP_PAD past
    the alignment), match/qbase describe the DIAG, and k counts the OP_INS ops
    that follow it (before the next column's consumer).
    insb: tuple of `words` int32[B, MC] (word w records run ranks
    7w+1..7w+7 at the same bit layout — the polish stage's long-insertion
    capacity, ctg_cns u16 deltas fc_correct_one_read.h:17-19); word 0 holds
    the first N_INSB inserted query bases of the column's
    run (bits 2(d-1)) and the last N_INSB counted backward (bits 14+2(d-1)).
    lead int32[B]: leading insertions before column 1.

    This is the scan-path (CPU oracle) converter; the Pallas backtrack kernel
    emits the same encoding directly."""
    B, LOPS = ops.shape
    i = jnp.arange(LOPS, dtype=jnp.int32)[None, :]
    valid = (i < n_ops[:, None]) & (ops != OP_PAD)
    consume_t = (ops != OP_INS) & valid
    consume_q = (ops != OP_DEL) & valid
    is_ins = (ops == OP_INS) & valid
    isdiag = (ops == OP_DIAG) & valid
    ct = jnp.cumsum(consume_t, axis=1).astype(jnp.int32)     # column of each op
    cq = jnp.cumsum(consume_q, axis=1).astype(jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], ops.shape)
    lin = rows * (MC + 1) + jnp.clip(ct, 0, MC)

    def col_sum(v):
        return jnp.zeros(B * (MC + 1), jnp.int32).at[lin.reshape(-1)].add(
            v.astype(jnp.int32).reshape(-1)).reshape(B, MC + 1)

    qb_op = jnp.take_along_axis(a.astype(jnp.int32),
                                jnp.clip(cq - 1, 0, a.shape[1] - 1), axis=1)
    tb_op = jnp.take_along_axis(b.astype(jnp.int32),
                                jnp.clip(ct - 1, 0, b.shape[1] - 1), axis=1)
    kflat = col_sum(is_ins)
    present = col_sum(consume_t)
    opflat = col_sum(jnp.where(consume_t, ops.astype(jnp.int32), 0))
    matchflat = col_sum(isdiag & (qb_op == tb_op))
    qbaseflat = col_sum(jnp.where(isdiag, qb_op, 0))
    # per-ins rank within its run (1-based): distance to the last non-INS op
    last_non_ins = jax.lax.cummax(jnp.where(~is_ins & valid, i, -1), axis=1)
    m = jnp.where(is_ins, i - last_non_ins, 0)
    k_of = jnp.take_along_axis(kflat, jnp.clip(ct, 0, MC), axis=1)
    insflats = []
    for w in range(words):
        insflat = jnp.zeros((B, MC + 1), jnp.int32)
        for d in range(1, N_INSB + 1):
            dd = w * N_INSB + d
            insflat = insflat | (col_sum(jnp.where(is_ins & (m == dd), qb_op, 0))
                                 << (2 * (d - 1)))
            insflat = insflat | (col_sum(jnp.where(is_ins & (m == k_of - dd + 1),
                                                   qb_op, 0))
                                 << (14 + 2 * (d - 1)))
        insflats.append(insflat[:, 1:])
    op_col = jnp.where(present[:, 1:] > 0, opflat[:, 1:], OP_PAD)
    cols = ((kflat[:, 1:] << 5) | (qbaseflat[:, 1:] << 3)
            | (matchflat[:, 1:] << 2) | op_col)
    return cols.astype(jnp.int32), tuple(insflats), kflat[:, 0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tail_match",))
def cols_clip_stats(cols, lead, a, b, tail_match: int = TAIL_MATCH):
    """Tail-clip + alignment stats in the per-column domain.

    Clips to the last run of `tail_match` consecutive matched DIAG columns
    (a run breaks on a mismatch, a DEL column, or intervening insertions —
    exactly the op-string M-run of clip_tail / oc_aligner.c:223-259).
    Returns dict(jc, q, t, n_match, n_cols): jc = clipped target-column count
    (= t consumed), q = query consumed, n_cols = total ops kept."""
    B, MC = cols.shape
    op = cols & 3
    k = cols >> 5
    active = op != OP_PAD
    isdiag = op == OP_DIAG
    jcol = jnp.arange(1, MC + 1, dtype=jnp.int32)[None, :]
    dq = jnp.where(isdiag, 1, 0) + jnp.where(active, k, 0)
    CQ = lead[:, None] + jnp.cumsum(dq, axis=1)              # q consumed thru col j
    # the column encoding already carries the DIAG match flag (bit 2, emitted
    # by both ops_to_cols and the Pallas backtrack) — recomputing it from the
    # sequences cost a [B, MC] lane gather, the slowest op class on TPU
    match = isdiag & (((cols >> 2) & 1) == 1)
    kprev = jnp.concatenate([lead[:, None], k[:, :-1]], axis=1)
    # run of matched columns ending at j, with a half-step barrier when the
    # previous column carried insertions (they break the op-string M run)
    e = jnp.where(~match, 2 * jcol,
                  jnp.where(kprev > 0, 2 * jcol - 1, -1))
    laste = jnp.maximum(jax.lax.cummax(e, axis=1), 1)  # implicit barrier before col 1
    run = (2 * jcol - laste + 1) // 2
    good = match & (run >= tail_match)
    jc = jnp.max(jnp.where(good, jcol, 0), axis=1).astype(jnp.int32)
    cum_match = jnp.cumsum(match, axis=1)
    cum_cols = jnp.cumsum(jnp.where(active, 1 + k, 0), axis=1)
    sel = jnp.clip(jc - 1, 0, MC - 1)[:, None]
    g = lambda x: jnp.take_along_axis(x, sel, axis=1)[:, 0]
    has = jc > 0
    k_jc = jnp.where(has, g(k), 0)
    q = jnp.where(has, g(CQ) - k_jc, 0).astype(jnp.int32)
    n_match = jnp.where(has, g(cum_match), 0).astype(jnp.int32)
    n_cols = jnp.where(has, lead + g(cum_cols) - k_jc, 0).astype(jnp.int32)
    return dict(jc=jc, q=q, t=jc, n_match=n_match, n_cols=n_cols)


def _gather_rev_prefix(batch, anchor, L):
    """rows[i] = batch[anchor-1-i], zero beyond; batch [B, LB] -> [B, L].

    Flip + per-row block shift (tags._row_shift): a take_along_axis gather on
    the lane axis ran ~45 M elem/s on TPU (36 ms per [128,12k] pair of
    gathers — it dominated the whole extension); the shift decomposition is
    pure aligned moves."""
    from necat_tpu.consensus.tags import _row_shift
    LB = batch.shape[1]
    out = _row_shift(batch[:, ::-1], anchor - LB)
    return out[:, :L] if LB >= L else jnp.concatenate(
        [out, jnp.zeros((batch.shape[0], L - LB), batch.dtype)], axis=1)


def _gather_suffix(batch, anchor, L):
    from necat_tpu.consensus.tags import _row_shift
    LB = batch.shape[1]
    out = _row_shift(batch, -anchor)
    return out[:, :L] if LB >= L else jnp.concatenate(
        [out, jnp.zeros((batch.shape[0], L - LB), batch.dtype)], axis=1)


class ExtensionResult:
    """Host-side SoA result of extend_batch."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def extend_batch(
    qbatch: jax.Array,   # uint8[B, LQ] query codes on the candidate's qdir strand
    qlens: jax.Array,    # int32[B]
    tbatch: jax.Array,   # uint8[B, LT]
    tlens: jax.Array,    # int32[B]
    anchor_q: jax.Array, # int32[B]
    anchor_t: jax.Array, # int32[B]
    W: int = 128,
    tail_match: int = TAIL_MATCH,
    insb_words: int = 1,
):
    """One fused jit call per batch (the chunk loop calls this hundreds of
    times; per-dispatch latency through a remote-attached TPU is milliseconds,
    so the whole two-pass extension compiles as a single program)."""
    out = _extend_batch_jit(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t,
                            W=W, tail_match=tail_match, insb_words=insb_words)
    return ExtensionResult(**out)


@functools.partial(jax.jit, static_argnames=("W", "tail_match", "insb_words"))
def _extend_batch_jit(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t,
                      W: int, tail_match: int, insb_words: int = 1):
    """Extend alignments outward from anchors for a batch of (query, target) pairs.

    Returns ExtensionResult with device arrays:
      left/right ops + counts, qoff/qend/toff/tend (int32[B]), n_match, n_cols,
      ident (float32[B], percent identity over the combined alignment).

    The full alignment of a pair is reverse(left ops) followed by right ops, where
    left ops are on reversed prefixes (a left DIAG at reversed position p aligns
    query[anchor_q-1-p'] etc.). Downstream tag generation consumes both parts.
    """
    B, LQ = qbatch.shape
    LT = tbatch.shape[1]
    qbatch = jnp.asarray(qbatch)
    tbatch = jnp.asarray(tbatch)
    qlens = jnp.asarray(qlens, jnp.int32)
    tlens = jnp.asarray(tlens, jnp.int32)
    anchor_q = jnp.asarray(anchor_q, jnp.int32)
    anchor_t = jnp.asarray(anchor_t, jnp.int32)

    use_pallas = _use_pallas(B)
    out = {}
    for side in ("left", "right"):
        if side == "left":
            la_full = anchor_q
            lb_full = anchor_t
            a = _gather_rev_prefix(qbatch, anchor_q, LQ)
            b = _gather_rev_prefix(tbatch, anchor_t, LT)
        else:
            la_full = qlens - anchor_q
            lb_full = tlens - anchor_t
            a = _gather_suffix(qbatch, anchor_q, LQ)
            b = _gather_suffix(tbatch, anchor_t, LT)
        # clamp the length mismatch to W/4 so both alignment endpoints sit near
        # the middle lane of the constant-center band (pallas_banded). Long
        # one-sided tails are unreachable dead weight anyway: the path would
        # spend |la-lb| pure indels that the tail clip removes. (This replaces
        # the reference's 1.3x last-block slack, oc_aligner.c:127-131; very
        # long clustered indels — its daligner rescue path — are traded for
        # band width here.)
        la = jnp.minimum(la_full, lb_full + W // 4)
        lb = jnp.minimum(lb_full, la_full + W // 4)
        if use_pallas:
            from necat_tpu.align.pallas_banded import (banded_backtrack_cols,
                                                       banded_forward_pallas)
            dirs, offs, _, cost = banded_forward_pallas(a, b, la, lb, W, max_cols=LT)
            cols, insb, lead = banded_backtrack_cols(dirs, la, lb, W, max_cols=LT,
                                                     words=insb_words)
        else:
            dirs, offs, _, cost = banded_forward(a, b, la, lb, W, max_cols=LT)
            ops, n_ops = banded_traceback(dirs, offs, la, lb, max_ops=LQ + LT)
            cols, insb, lead = ops_to_cols(ops, n_ops, a, b, MC=LT,
                                           words=insb_words)
        st = cols_clip_stats(cols, lead, a, b, tail_match)
        # leading-run inserted bases, delta-indexed (entry d-1 = base at delta d)
        # so the tag scatter never needs the query batch again:
        #   right/fwd pass: delta d -> a[d-1]; left/rev pass: delta d -> a[lead-d]
        dl = jnp.arange(1, N_INSB * insb_words + 1, dtype=jnp.int32)[None, :]
        lidx = (dl - 1) if side == "right" else (lead[:, None] - dl)
        leadb = jnp.take_along_axis(a, jnp.clip(lidx, 0, a.shape[1] - 1), axis=1)
        out[side] = dict(cols=cols, insb=insb, lead=lead, leadb=leadb,
                         jc=st["jc"], q=st["q"], t=st["t"],
                         n_match=st["n_match"], n_cols=st["n_cols"])

    qoff = anchor_q - out["left"]["q"]
    toff = anchor_t - out["left"]["t"]
    qend = anchor_q + out["right"]["q"]
    tend = anchor_t + out["right"]["t"]
    n_cols = out["left"]["n_cols"] + out["right"]["n_cols"]
    n_match = out["left"]["n_match"] + out["right"]["n_match"]
    ident = jnp.where(n_cols > 0, 100.0 * n_match / jnp.maximum(n_cols, 1), 0.0)
    # stats packed into one array so callers do a single host transfer
    stats = jnp.stack([qoff, qend, toff, tend, n_cols, n_match], axis=0)
    res = dict(
        left_cols=out["left"]["cols"], left_insb=out["left"]["insb"][0],
        left_lead=out["left"]["lead"], left_leadb=out["left"]["leadb"],
        left_jc=out["left"]["jc"],
        right_cols=out["right"]["cols"], right_insb=out["right"]["insb"][0],
        right_lead=out["right"]["lead"], right_leadb=out["right"]["leadb"],
        right_jc=out["right"]["jc"],
        qoff=qoff, qend=qend, toff=toff, tend=tend,
        n_cols=n_cols, n_match=n_match, ident=ident, stats=stats,
    )
    for w in range(1, insb_words):   # extra insertion words (polish long runs)
        res[f"left_insb{w + 1}"] = out["left"]["insb"][w]
        res[f"right_insb{w + 1}"] = out["right"]["insb"][w]
    return res
