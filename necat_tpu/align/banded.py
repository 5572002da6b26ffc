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

INF = jnp.int32(1 << 20)
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
        dcur = dirs[bidx, jj, slot]
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


def _gather_rev_prefix(batch, anchor, L):
    """rows[i] = batch[anchor-1-i], zero beyond; batch [B, LB] -> [B, L]."""
    B = batch.shape[0]
    idx = anchor[:, None] - 1 - jnp.arange(L)[None, :]
    ok = idx >= 0
    return jnp.where(ok, jnp.take_along_axis(batch, jnp.clip(idx, 0, batch.shape[1] - 1), axis=1), 0)


def _gather_suffix(batch, anchor, L):
    idx = anchor[:, None] + jnp.arange(L)[None, :]
    ok = idx < batch.shape[1]
    return jnp.where(ok, jnp.take_along_axis(batch, jnp.clip(idx, 0, batch.shape[1] - 1), axis=1), 0)


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
):
    """One fused jit call per batch (the chunk loop calls this hundreds of
    times; per-dispatch latency through a remote-attached TPU is milliseconds,
    so the whole two-pass extension compiles as a single program)."""
    out = _extend_batch_jit(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t,
                            W=W, tail_match=tail_match)
    return ExtensionResult(**out)


@functools.partial(jax.jit, static_argnames=("W", "tail_match"))
def _extend_batch_jit(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t,
                      W: int, tail_match: int):
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
            from necat_tpu.align.pallas_banded import banded_forward_pallas
            dirs, offs, _, cost = banded_forward_pallas(a, b, la, lb, W, max_cols=LT)
        else:
            dirs, offs, _, cost = banded_forward(a, b, la, lb, W, max_cols=LT)
        ops, n_ops = banded_traceback(dirs, offs, la, lb, max_ops=LQ + LT)
        n_clip, match = clip_tail(ops, n_ops, a, b, tail_match)
        keep = jnp.arange(ops.shape[1])[None, :] < n_clip[:, None]
        q_consumed = ((ops != OP_DEL) & keep).sum(axis=1).astype(jnp.int32)
        t_consumed = ((ops != OP_INS) & keep).sum(axis=1).astype(jnp.int32)
        n_match = (match & keep).sum(axis=1).astype(jnp.int32)
        out[side] = dict(ops=ops, n_ops=n_clip, q=q_consumed, t=t_consumed, n_match=n_match)

    qoff = anchor_q - out["left"]["q"]
    toff = anchor_t - out["left"]["t"]
    qend = anchor_q + out["right"]["q"]
    tend = anchor_t + out["right"]["t"]
    n_cols = out["left"]["n_ops"] + out["right"]["n_ops"]
    n_match = out["left"]["n_match"] + out["right"]["n_match"]
    ident = jnp.where(n_cols > 0, 100.0 * n_match / jnp.maximum(n_cols, 1), 0.0)
    # stats packed into one array so callers do a single host transfer
    stats = jnp.stack([qoff, qend, toff, tend, n_cols, n_match], axis=0)
    return dict(
        left_ops=out["left"]["ops"], left_n=out["left"]["n_ops"],
        right_ops=out["right"]["ops"], right_n=out["right"]["n_ops"],
        qoff=qoff, qend=qend, toff=toff, tend=tend,
        n_cols=n_cols, n_match=n_match, ident=ident, stats=stats,
    )
